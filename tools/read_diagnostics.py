"""Decode a diagnostics capture (archived r9 artifact or a live
DIAGNOSTICS.json from a future red round).

Compares, per red query: the Spark hash captured INSIDE the driver run,
the current-oracle hash from the driver environment's own duckdb, the
frozen round-8 oracle hash, and this machine's live re-run — then says
which of the round-9 theories the evidence supports.

Usage: python tools/read_diagnostics.py [path-to-diagnostics.json]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    path = (sys.argv[1] if len(sys.argv) > 1
            else "/root/repo/docs/DIAGNOSTICS_r9.json")
    data = json.load(open(path))
    envs = {}
    for key, rec in sorted(data.items()):
        env = rec.get("env", {})
        stamp = (env.get("duckdb"), env.get("pyspark"),
                 env.get("spark.sql.session.timeZone"),
                 rec.get("duck_probes", {}).get("neg_floordiv"))
        envs.setdefault(stamp, []).append(key)
        spark_h = rec.get("spark", {}).get("hash")
        cur_h = rec.get("oracle_current", {}).get("hash")
        froz = rec.get("oracle_frozen_r8", {})
        froz_h = froz.get("hash") if isinstance(froz, dict) else None
        verdict = []
        if spark_h and cur_h:
            verdict.append("spark==current-oracle" if spark_h == cur_h
                           else "SPARK != CURRENT ORACLE (in-env!)")
        if spark_h and froz_h:
            verdict.append(
                "frozen-r8 oracle MATCHES spark (division theory dead here)"
                if froz_h == spark_h else
                "frozen-r8 oracle DIVERGES from spark in this env "
                "(r8 oracle was version-broken here — root cause confirmed)")
        elif "err" in froz:
            verdict.append(f"frozen run err: {froz['err']}")
        print(f"{key}:")
        print(f"  spark={spark_h} current={cur_h} frozen_r8={froz_h}")
        print(f"  -> {'; '.join(verdict) or 'incomplete capture'}")
    print("\nEnvironment stamps (duckdb, pyspark, session tz, (-7)//2):")
    for stamp, keys in envs.items():
        print(f"  {stamp}: {len(keys)} records")
    print(
        "\nDecoding guide:\n"
        "- All spark==current==frozen AND the driver still reds them in\n"
        "  CORRECTNESS_r09 -> the driver's comparator normalization is\n"
        "  the cause (HUGEINT/DECIMAL fetch degradation; the r9 BIGINT\n"
        "  pinning should fix the current oracles regardless).\n"
        "- frozen diverges, current matches -> r8 oracle constructs were\n"
        "  engine-version-dependent in the driver env; r9 fix correct.\n"
        "- duckdb version != 1.0.0 or (-7)//2 != -3 -> engine-version\n"
        "  divergence confirmed directly.\n"
        "- CAVEAT eval_f1_macro: its r9 SPARK semantics changed too\n"
        "  (NULL ppm -> -1 sentinel), so frozen-r8 divergence there is\n"
        "  expected EVERYWHERE and proves nothing; judge it on the other\n"
        "  seven (their spark-side values are r8-identical)."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
