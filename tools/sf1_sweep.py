"""Full-registry correctness sweep at sf1 (10x fact-scaled sf0.1,
tools/sf_scale.py) with per-query wall-clock budgets — VERDICT r3 item 1.

Same compare as tools/check_correctness.py (row count, column set,
order-insensitive exact values) but both sides are bounded:

* the Spark phase runs under a cancel-jobs watchdog;
* the DuckDB oracle runs in a SUBPROCESS that COPYs its result to
  parquet — ``duckdb.interrupt()`` from a timer thread proved unable to
  stop a long-running operator tree (observed: 25+ min past the budget),
  and a subprocess can always be SIGKILLed.

Writes JSON results to --out (default /tmp/sf1_sweep.json); SF1SWEEP.md is
generated from that.

Usage: python tools/sf1_sweep.py [--sf-dir DIR] [--timeout SEC] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import threading
import time

_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _TOOLS_DIR)
sys.path.insert(0, os.path.dirname(_TOOLS_DIR))  # repo root → tectonic_spark

from check_correctness import TABLES, compare  # noqa: E402


class _Watchdog:
    """Run ``fn`` with a wall budget; on expiry call ``cancel`` and report."""

    def __init__(self, budget: float, cancel) -> None:
        self.budget = budget
        self.cancel = cancel
        self.fired = False

    def run(self, fn):
        timer = threading.Timer(self.budget, self._fire)
        timer.daemon = True
        timer.start()
        try:
            return fn()
        finally:
            timer.cancel()

    def _fire(self) -> None:
        self.fired = True
        try:
            self.cancel()
        except Exception:  # noqa: BLE001 — cancellation is best-effort
            pass


_ORACLE_RUNNER = """
import sys, duckdb
sf_dir, out = sys.argv[1], sys.argv[2]
sql = sys.stdin.read()
con = duckdb.connect()
for t in {tables!r}:
    con.execute(
        f"CREATE VIEW {{t}} AS SELECT * FROM read_parquet('{{sf_dir}}/{{t}}.parquet')"
    )
con.execute(f"COPY ({{sql}}) TO '{{out}}' (FORMAT PARQUET)")
""".format(tables=TABLES)


def run_oracle(sql: str, sf_dir: str, timeout: float):
    """Execute oracle SQL in a killable subprocess → pandas frame."""
    import pandas as pd

    fd, out = tempfile.mkstemp(suffix=".parquet")
    os.close(fd)
    os.unlink(out)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _ORACLE_RUNNER, sf_dir, out],
            input=sql.encode(),
            capture_output=True,
            timeout=timeout,
        )
        if proc.returncode != 0:
            raise RuntimeError(proc.stderr.decode()[-300:])
        df = pd.read_parquet(out)
        # parity with the driver's fetchdf path: parquet DATE comes back as
        # datetime.date objects, fetchdf as datetime64 — canonicalize so
        # date-typed oracle columns stringify identically ('1995-01-01
        # 00:00:00' both ways); duckdb.fetchdf is what the real gate uses.
        import datetime

        for c in df.columns:
            if df[c].dtype == object and df[c].map(
                lambda v: v is None or isinstance(v, datetime.date)
            ).all() and df[c].notna().any():
                df[c] = pd.to_datetime(df[c])
        return df
    finally:
        if os.path.exists(out):
            os.unlink(out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=None)
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--out", default="/tmp/sf1_sweep.json")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    if args.sf_dir is None:
        from sf_scale import ensure_scaled

        args.sf_dir = ensure_scaled("/root/testdata/sf0.1", 10)

    import tectonic_spark.operators as ops
    from tectonic_spark import get_spark

    spark = get_spark(app_name="tectonic-sf1-sweep")

    # Named exclusions: configs that are intractable at sf1 BY CONSTRUCTION
    # (not by accident) — skipped in full sweeps so the budget isn't burned
    # rediscovering them, still runnable by naming them explicitly. Each
    # must have independent sf1 coverage in tools/sf1_deep_checks.py.
    skip_at_sf1 = {
        "c01_semantic_dedup": "O(N^2/K) pair volume at the oracle-pinned "
        "K=8; scale path (semantic_dedup_scaled_df, k=64) is deep-checked",
    }

    names = args.names or [n for n in ops.REGISTRY if n not in skip_at_sf1]
    results: dict[str, dict] = {}
    if not args.names:
        for n, why in skip_at_sf1.items():
            results[n] = {"status": "skipped_named_exclusion", "err": why}
            print(f"SKIP           {n}: {why[:90]}")
    n_pass = n_fail = n_timeout = n_rows_only = 0
    for name in names:
        q = ops.REGISTRY[name]
        rec: dict = {}
        results[name] = rec

        t0 = time.perf_counter()
        wd = _Watchdog(args.timeout, spark.sparkContext.cancelAllJobs)
        try:
            sdf = wd.run(lambda: q.builder(spark, args.sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            rec["status"] = "spark_timeout" if wd.fired else "spark_error"
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            rec["spark_sec"] = round(time.perf_counter() - t0, 1)
            n_timeout += wd.fired
            n_fail += not wd.fired
            print(f"{rec['status'].upper():14s} {name} ({rec['spark_sec']}s)")
            continue
        rec["spark_sec"] = round(time.perf_counter() - t0, 1)
        rec["spark_rows"] = len(sdf)

        if q.oracle is None:
            rec["status"] = "rows_only"
            n_rows_only += 1
            print(f"rows_only      {name}: {len(sdf)} rows ({rec['spark_sec']}s)")
            continue

        t0 = time.perf_counter()
        try:
            odf = run_oracle(q.oracle, args.sf_dir, args.timeout)
        except subprocess.TimeoutExpired:
            rec["status"] = "oracle_timeout"
            rec["oracle_sec"] = round(time.perf_counter() - t0, 1)
            n_timeout += 1
            print(f"ORACLE_TIMEOUT {name} ({rec['oracle_sec']}s)")
            continue
        except Exception as e:  # noqa: BLE001
            rec["status"] = "oracle_error"
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
            rec["oracle_sec"] = round(time.perf_counter() - t0, 1)
            n_fail += 1
            print(f"ORACLE_ERROR   {name} ({rec['oracle_sec']}s): {rec['err'][:120]}")
            continue
        rec["oracle_sec"] = round(time.perf_counter() - t0, 1)
        rec["oracle_rows"] = len(odf)

        problems = compare(name, sdf, odf)
        if problems:
            rec["status"] = "mismatch"
            rec["err"] = "; ".join(problems)[:500]
            n_fail += 1
            print(f"MISMATCH       {name}: {rec['err'][:160]}")
        else:
            rec["status"] = "pass"
            n_pass += 1
            print(
                f"ok             {name}: {len(sdf)} rows "
                f"(spark {rec['spark_sec']}s, oracle {rec['oracle_sec']}s)"
            )

    summary = {
        "sf_dir": args.sf_dir,
        "timeout_sec": args.timeout,
        "n_queries": len(names),
        "n_pass": n_pass,
        "n_rows_only": n_rows_only,
        "n_timeout": n_timeout,
        "n_fail": n_fail,
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "queries": results}, f, indent=1)
    print(json.dumps(summary))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
