"""Composed mixed-modality curation funnel at 10x (r9) — q237's whole
pipeline (encode two copies per doc -> magic-byte routing -> four
perceptual/exact keyers over seven real codecs -> unified election ->
census) timed at sf0.01 and sf0.1. The funnel is Arrow-batched at
media grain with no payload shuffle, so wall should scale ~linearly
with the corpus (the encode+decode passes dominate); the election
shuffles only (id, short-key) rows.

Usage: python scripts/scale_probe_media_curate.py
Prints one markdown row per scale for SCALE.md.
"""

import sys
import time

sys.path.insert(0, ".")


def main():
    from sunat_rree_demo_spark.queries.base import REGISTRY
    import sunat_rree_demo_spark.queries  # noqa: F401
    from sunat_rree_demo_spark.session import get_spark, tune

    spark = tune(get_spark())
    # __wrapped__ bypasses the plan memo: a memoized DataFrame's
    # re-collect reuses the session's shuffle files and skips the
    # encode/decode stages entirely — the probe must pay the real
    # funnel every run
    fn = REGISTRY["q237_media_curation_summary"].fn.__wrapped__
    fn(spark, "/root/testdata/sf0.01").collect()  # session warmup
    print("| scale | run | wall | rows |", flush=True)
    print("|---|---|---|---|", flush=True)
    walls = {}
    for scale, sf in (("1x", "/root/testdata/sf0.01"),
                      ("10x", "/root/testdata/sf0.1")):
        for run in ("fresh1", "fresh2"):
            t0 = time.time()
            out = fn(spark, sf).collect()
            dt = time.time() - t0
            walls[(scale, run)] = dt
            n = sum(r["n_items"] for r in out)
            print(f"| {scale} | {run} | {dt:.2f} s | {n} media |",
                  flush=True)
    print(f"\nfresh-plan ratio (10x / 1x, second runs): "
          f"{walls[('10x', 'fresh2')] / walls[('1x', 'fresh2')]:.2f}x",
          flush=True)


if __name__ == "__main__":
    main()
