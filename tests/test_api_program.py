"""LabSDK-compatible decorator API + handler→Column AST compiler.

Reference surface: /root/reference/labsdk/raptor/decorators.py
(@feature 364-527, @aggregation 290-338, @freshness 121-162,
@keep_previous 339-361); program parsing program.py:210-322.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from raptor_spark.api import (
    aggregation,
    feature,
    freshness,
    keep_previous,
    model,
    namespace,
)
from raptor_spark.program import ProgramError, compile_handler
from raptor_spark.sources.transcripts import transcripts


class TestProgramCompiler:
    def test_branching_handler_matches_python(self, spark):
        def handler(this_row, ctx) -> float:
            """tool turns don't count; short text scores half"""
            if this_row["role"] == "tool":
                return None
            if len(this_row["text"]) < 40:
                return len(this_row["text"]) / 2
            return len(this_row["text"])

        prog = compile_handler(handler)
        src = transcripts(spark, 6)
        got = src.select("role", "text", prog(src).alias("v")).toPandas()
        exp = got.apply(
            lambda r: handler({"role": r["role"], "text": r["text"]}, None),
            axis=1,
        )
        assert (
            got["v"].astype(float).fillna(-1).round(6)
            == exp.astype(float).fillna(-1).round(6)
        ).all()

    def test_fallthrough_elif_chain(self, spark):
        def handler(this_row, ctx) -> str:
            if this_row["role"] == "user":
                return "q"
            elif this_row["role"] == "assistant":
                return "a"
            return "other"

        prog = compile_handler(handler)
        src = transcripts(spark, 4)
        got = {
            (r["role"], r["v"])
            for r in src.select("role", prog(src).alias("v")).distinct().collect()
        }
        assert ("user", "q") in got and ("assistant", "a") in got
        assert all(v == "other" for ro, v in got if ro not in ("user", "assistant"))

    def test_operators_and_builtins(self, spark):
        def handler(this_row, ctx) -> float:
            t = this_row  # noqa: F841  (not supported: assignments)
            return 0.0

        def ok(this_row, ctx) -> float:
            return min(abs(-len(this_row["text"])), 100) + (
                1.0 if this_row["role"] in ("user", "tool") else 0.0
            )

        prog = compile_handler(ok)
        src = transcripts(spark, 2)
        row = src.select(prog(src).alias("v"), "role", F.length("text").alias("n")).first()
        want = min(abs(-row["n"]), 100) + (1.0 if row["role"] in ("user", "tool") else 0.0)
        assert row["v"] == want
        with pytest.raises(ProgramError, match="unsupported statement"):
            compile_handler(handler)

    def test_loops_rejected_at_definition(self):
        def bad(this_row, ctx) -> float:
            s = 0
            for w in this_row["text"]:
                s += 1
            return s

        with pytest.raises(ProgramError):
            compile_handler(bad)

    def test_ctx_get_feature_extracts_dependencies(self):
        def derived(this_row, ctx) -> float:
            return ctx.get_feature("turn_len") / max(ctx.get_feature("turns_10m_count"), 1)

        prog = compile_handler(derived)
        assert prog.dependencies == ("turn_len", "turns_10m_count")

    def test_may_be_null_detection(self):
        def partial(this_row, ctx) -> float:
            if this_row["role"] == "tool":
                return 1.0
            return None

        def total(this_row, ctx) -> float:
            return len(this_row["text"])

        def fall_off(this_row, ctx) -> float:
            if this_row["role"] == "tool":
                return 1.0

        def ternary_null(this_row, ctx) -> float:
            return 1.0 if this_row["role"] == "tool" else None

        def exhaustive(this_row, ctx) -> float:
            if this_row["role"] == "tool":
                return 1.0
            else:
                return 2.0

        def exhaustive_elif(this_row, ctx) -> float:
            if this_row["role"] == "tool":
                return 1.0
            elif this_row["role"] == "user":
                return 2.0
            else:
                return 3.0

        def elif_no_else(this_row, ctx) -> float:
            if this_row["role"] == "tool":
                return 1.0
            elif this_row["role"] == "user":
                return 2.0

        assert compile_handler(partial).may_be_null
        assert not compile_handler(total).may_be_null
        assert compile_handler(fall_off).may_be_null
        assert compile_handler(ternary_null).may_be_null
        # every branch returns → the fall-through is unreachable and
        # must NOT mark the handler nullable (ADVICE r2: a false
        # positive routes a total handler through the fill machinery)
        assert not compile_handler(exhaustive).may_be_null
        assert not compile_handler(exhaustive_elif).may_be_null
        assert compile_handler(elif_no_else).may_be_null


class TestDecoratorSurface:
    def test_feature_decorator_builds_spec(self):
        @feature(keys="conv_id", data_source="transcripts")
        @freshness(max_age="10m", max_stale="1h")
        @aggregation(function=["count", "sum"], over="1h", granularity="5m")
        @keep_previous(versions=2, over="30m")
        @namespace("prod")
        def tool_calls(this_row, ctx) -> float:
            if this_row["role"] == "tool":
                return 1.0
            return None

        s = tool_calls.raptor_spec
        assert s.name == "tool_calls" and s.namespace == "prod"
        assert s.keys == ("conv_id",)
        assert s.freshness_us == 600_000_000 and s.staleness_us == 3_600_000_000
        assert s.aggr.fns == ("count", "sum") and s.aggr.over_us == 3_600_000_000
        assert s.keep_previous.versions == 2
        assert tool_calls.fqn == "prod.tool_calls"
        with pytest.raises(TypeError, match="does not execute per-row"):
            tool_calls({"role": "tool"}, None)

    def test_feature_replay(self, spark):
        @feature(keys="conv_id", data_source="transcripts")
        @freshness(max_age="1h")
        def turn_len(this_row, ctx) -> float:
            return len(this_row["text"])

        fv = turn_len.replay(transcripts(spark, 4))
        assert set(fv.columns) == {"fqn", "keys", "ts", "value"}
        assert fv.filter(F.col("value") <= 0).count() == 0

    def test_model_features_and_labels_fused(self, spark):
        @feature(keys="conv_id", data_source="transcripts")
        @freshness(max_age="1h")
        def turn_len(this_row, ctx) -> float:
            return len(this_row["text"])

        @feature(keys="conv_id", data_source="transcripts")
        @aggregation(function=["count"], over="10m")
        def turns_10m(this_row, ctx) -> float:
            return 1.0

        @feature(keys="conv_id")  # sourceless: derived from the others
        def len_per_turn(this_row, ctx) -> float:
            return ctx.get_feature("turn_len") / max(
                ctx.get_feature("turns_10m_count"), 1.0
            )

        @model(
            keys="conv_id",
            input_features=[turn_len, turns_10m],
            input_labels=[len_per_turn],
            key_feature=turn_len,
        )
        def m(ctx):
            pass

        src = transcripts(spark, 8).cache()
        wide = m.features_and_labels(spark, sources={"transcripts": src})
        assert {"conv_id", "ts", "turn_len", "turns_10m_count", "len_per_turn"} <= set(
            wide.columns
        )
        assert wide.count() == src.count()
        # all features share one source → the fused single-shuffle plan
        plan = wide._jdf.queryExecution().executedPlan().toString()
        assert "Union" not in plan
        row = wide.filter(F.col("turns_10m_count") > 0).first()
        assert row["len_per_turn"] == pytest.approx(
            row["turn_len"] / max(row["turns_10m_count"], 1.0)
        )

    def test_model_string_selectors(self, spark):
        """input_features as FQN selector strings ('name+fn', '@-N')
        resolved from the definition registry; the output is projected
        to exactly the selected columns."""

        @feature(keys="conv_id", data_source="transcripts")
        @freshness(max_age="1h")
        @keep_previous(versions=1, over="1h")
        def sel_turn_len(this_row, ctx) -> float:
            return len(this_row["text"])

        @feature(keys="conv_id", data_source="transcripts")
        @aggregation(function=["count", "sum"], over="10m")
        def sel_turns(this_row, ctx) -> float:
            return 1.0

        @model(
            keys="conv_id",
            input_features=["sel_turn_len", "sel_turns+count", "sel_turn_len@-1"],
            key_feature="sel_turn_len",
        )
        def m(ctx):
            pass

        src = transcripts(spark, 5)
        wide = m.features_and_labels(spark, sources={"transcripts": src})
        assert wide.columns == [
            "conv_id", "ts", "sel_turn_len", "sel_turns_count",
            "sel_turn_len_prev1",
        ]
        assert wide.count() == src.count()

    def test_model_selector_errors(self):
        @feature(keys="conv_id", data_source="transcripts")
        def sel_plain(this_row, ctx) -> float:
            return len(this_row["text"])

        with pytest.raises(KeyError, match="does not match"):
            model(keys="conv_id", input_features=["no_such_feature"])(lambda ctx: 0)
        with pytest.raises(ValueError, match="produces"):
            model(keys="conv_id", input_features=["sel_plain+sum"])(lambda ctx: 0)

    def test_wrong_decorator_order_raises(self):
        """@feature below an inner decorator would silently drop the
        options — must fail loudly at definition time."""
        with pytest.raises(TypeError, match="outermost"):
            @aggregation(function=["count"], over="1h")
            @feature(keys="conv_id", data_source="transcripts")
            def misordered(this_row, ctx) -> float:
                return 1.0

    def test_explicit_namespace_selector_no_fallback(self):
        """A selector with an explicit (wrong) namespace must NOT
        silently resolve to a same-named feature elsewhere."""

        @feature(keys="conv_id", data_source="transcripts")
        @namespace("sales")
        def ns_scoped(this_row, ctx) -> float:
            return 1.0

        m = model(keys="conv_id", input_features=["sales.ns_scoped"])
        m(lambda ctx: 0)  # explicit correct namespace resolves
        with pytest.raises(KeyError, match="does not match"):
            model(keys="conv_id", input_features=["other.ns_scoped"])(
                lambda ctx: 0
            )
        # bare name still falls back
        model(keys="conv_id", input_features=["ns_scoped"])(lambda ctx: 0)

    def test_manifest_layout(self):
        import yaml

        from raptor_spark.durations import parse_duration_us

        @feature(keys="conv_id", data_source="transcripts")
        @freshness(max_age="10m", max_stale="1h")
        @aggregation(function=["count"], over="1h", granularity="5m")
        def mani_feat(this_row, ctx) -> float:
            return 1.0

        doc = yaml.safe_load(mani_feat.manifest())
        assert doc["apiVersion"] == "k8s.raptor.ml/v1alpha1"
        assert doc["kind"] == "Feature"
        assert doc["metadata"]["name"] == "mani-feat"
        spec = doc["spec"]
        assert spec["keys"] == ["conv_id"]
        assert spec["dataSource"] == "transcripts"
        assert spec["builder"]["aggr"] == ["count"]
        assert "def mani_feat" in spec["builder"]["code"]
        # durations round-trip
        assert parse_duration_us(spec["freshness"]) == 600_000_000
        assert parse_duration_us(spec["builder"]["aggrGranularity"]) == 300_000_000

    def test_aggregation_type_rule_at_definition(self):
        with pytest.raises(TypeError, match="numeric return"):
            @feature(keys="conv_id", data_source="transcripts")
            @aggregation(function=["sum"], over="1h")
            def bad_sum(this_row, ctx) -> str:
                return this_row["role"]

        # count over a string is legal (api/feature.go: count any type)
        @feature(keys="conv_id", data_source="transcripts")
        @aggregation(function=["count"], over="1h")
        def ok_count(this_row, ctx) -> str:
            return this_row["role"]

    def test_data_source_object_binding(self, spark):
        """@data_source: schema validation at definition time, timestamp
        binding, and features_and_labels without a sources dict."""
        from raptor_spark.api import data_source

        src = transcripts(spark, 4).withColumnRenamed("ts", "event_at")

        @data_source(training_data=src, keys="conv_id", timestamp="event_at")
        class Transcript:
            conv_id: str
            turn_idx: int
            role: str
            text: str
            event_at: object

        @feature(keys="conv_id", data_source=Transcript)
        @freshness(max_age="1h")
        def ds_turn_len(this_row, ctx) -> float:
            return len(this_row["text"])

        assert ds_turn_len.spec.timestamp_col == "event_at"

        with pytest.raises(ValueError, match="not declared"):
            @feature(keys="conv_id", data_source=Transcript)
            def bad_col(this_row, ctx) -> float:
                return len(this_row["no_such_column"])

        @model(keys="conv_id", input_features=[ds_turn_len],
               key_feature=ds_turn_len)
        def m(ctx):
            pass

        wide = m.features_and_labels(spark)  # no sources dict needed
        assert wide.count() == src.count()
        assert "ds_turn_len" in wide.columns

    def test_derived_with_data_source_rejected(self):
        with pytest.raises(ValueError, match="derived"):
            @feature(keys="conv_id", data_source="transcripts")
            def bad(this_row, ctx) -> float:
                return ctx.get_feature("other")


def test_model_rejects_cross_namespace_name_collision(spark):
    """Two same-named features from different namespaces would collide
    in the wide frame — model() must raise, not silently drop one
    (review r3)."""
    import pytest

    from raptor_spark import api

    @api.feature(keys="user_id", data_source="events")
    @api.namespace("ns_a")
    def colliding_score(this_row, ctx) -> float:
        return this_row["value"]

    @api.feature(keys="user_id", data_source="events")
    @api.namespace("ns_b")
    def colliding_score_b(this_row, ctx) -> float:
        return this_row["value"] * 2.0

    # forge the name collision across namespaces
    colliding_score_b.spec = colliding_score_b.spec.__class__(
        **{**colliding_score_b.spec.__dict__, "name": "colliding_score"}
    )
    with pytest.raises(ValueError, match="share\\s+output name|share output name"):
        @api.model(
            keys="user_id",
            input_features=[colliding_score, colliding_score_b],
            input_labels=[],
            key_feature=colliding_score,
        )
        def m(ctx):
            pass
