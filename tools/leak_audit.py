"""Per-query storage-leak audit: the release contract, asserted for ALL
registered queries.

The repo's cache discipline says: materialize a query's result, call the
release path (``ids.release_spines`` + the ``Engine.release`` attribute
set + ``release_local_checkpoint`` on the discarded result), and executor
storage returns to baseline — nothing pinned survives.  parity.py RELIES
on this but papers over violations with ``clearCache`` between queries
(which also cannot see checkpoint blocks).  This tool asserts the
contract per query, with NO clearCache: any query whose release leaves
new persistent RDDs behind is a carry-strip bug of the class the r14/r15
advice items named (q136/q187/q203/q206/q218...).

Usage: python tools/leak_audit.py [sf_dir] [query ...]   (~10-15 min full)
Prints one line per query; exits 1 if any query leaks.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from re_data_pipeline_spark.session import get_spark


def persistent_ids(spark) -> set[int]:
    return {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def release_all(df, spark) -> int:
    """The full client-side release path: ``ids.release_handles`` (spine
    handles + the shared ``HANDLE_ATTRS`` set — the SAME function
    ``Engine.release`` delegates to, so this audit asserts exactly the
    engine's release contract) plus the discarded result's own checkpoint
    blocks."""
    from re_data_pipeline_spark.operators.ids import (
        release_handles,
        release_local_checkpoint,
    )

    n = release_handles(df)
    release_local_checkpoint(df)
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from re_data_pipeline_spark.plans.queries import QUERIES

    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    leakers: list[str] = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        # settle any async unpersists from the previous query before the
        # baseline snapshot (unpersist(blocking=False) races the probe)
        time.sleep(0.05)
        before = persistent_ids(spark)
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            release_all(df, spark)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            leakers.append(name)
            spark.catalog.clearCache()
            continue
        # async unpersist: give the ContextCleaner a beat, then re-probe
        leaked = persistent_ids(spark) - before
        if leaked:
            time.sleep(1.0)
            leaked = persistent_ids(spark) - before
        status = "LEAK" if leaked else "ok  "
        print(f"{status} {name}: {len(leaked)} pinned ({time.time()-t0:.1f}s)"
              + (f" rdds={sorted(leaked)}" if leaked else ""))
        if leaked:
            leakers.append(name)
            # contain the damage so later queries measure their own leaks
            spark.catalog.clearCache()
    if leakers:
        print(f"\n{len(leakers)} queries violate the release contract: "
              + ", ".join(leakers))
        return 1
    print("\nall queries release to baseline")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
