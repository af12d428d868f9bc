#!/usr/bin/env python
"""spark-submit entry for the PIT backfill (north-rule launch shape).

    python tools/make_submit_pkg.py
    spark-submit --master <cluster> --py-files raptor_spark.zip \
        submit_backfill.py --out <dir> --n-convs 500000 --shards 64

A top-level launcher (not ``raptor_spark/backfill.py`` directly)
because spark-submit runs the primary file as ``__main__`` where
package-relative imports don't resolve; the zip on --py-files provides
the package to the driver and executors.
"""

from raptor_spark.backfill import main

if __name__ == "__main__":
    main()
