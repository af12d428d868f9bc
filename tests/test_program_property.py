"""Property test: the handler→Column compiler agrees with plain Python
evaluation on randomly generated programs (the compiler's contract —
same semantics, different executor)."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from raptor_spark.program import compile_handler

# expression grammar over two numeric columns a, b (ints, non-null)
_NUM = st.integers(min_value=-50, max_value=50)


def _expr(depth: int):
    leaf = st.one_of(
        st.just("this_row['a']"),
        st.just("this_row['b']"),
        _NUM.map(str),
    )
    if depth <= 0:
        return leaf
    sub = _expr(depth - 1)
    return st.one_of(
        leaf,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        # % and // with positive literal divisors (Python sign-of-
        # divisor semantics, compiled to pmod / floor-div)
        st.tuples(sub, st.sampled_from(["%", "//"]),
                  st.integers(min_value=1, max_value=23)).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(sub, sub).map(lambda t: f"min({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"max({t[0]}, {t[1]})"),
        sub.map(lambda e: f"abs({e})"),
        st.tuples(sub, st.sampled_from(["<", "<=", ">", ">=", "=="]), sub, sub, sub).map(
            lambda t: f"({t[3]} if {t[0]} {t[1]} {t[2]} else {t[4]})"
        ),
    )


@st.composite
def programs(draw):
    body = draw(_expr(3))
    cond = draw(_expr(1))
    op = draw(st.sampled_from(["<", ">", "=="]))
    thresh = draw(_NUM)
    alt = draw(_expr(2))
    return (
        "def handler(this_row, ctx) -> int:\n"
        f"    if {cond} {op} {thresh}:\n"
        f"        return {body}\n"
        f"    return {alt}\n"
    )


@pytest.mark.usefixtures("spark")
class TestCompilerProperty:
    @settings(max_examples=25, deadline=None)
    @given(src=programs(), rows=st.lists(
        st.tuples(st.integers(-100, 100), st.integers(-100, 100)),
        min_size=1, max_size=8,
    ))
    def test_compiled_equals_python(self, spark, src, rows):
        ns: dict = {}
        exec(src, {"math": math}, ns)
        handler = ns["handler"]
        # compile_handler reads source via inspect — exec'd functions
        # have no source, so attach it through a temp module file
        import importlib.util
        import tempfile

        with tempfile.NamedTemporaryFile(
            "w", suffix=".py", delete=False
        ) as f:
            f.write(src)
            path = f.name
        spec = importlib.util.spec_from_file_location("gen_handler", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        prog = compile_handler(mod.handler)

        df = spark.createDataFrame(rows, "a long, b long")
        got = [
            r["v"]
            for r in df.select(prog(df).alias("v")).collect()
        ]
        want = [mod.handler({"a": a, "b": b}, None) for a, b in rows]
        assert got == want
