"""Focused 100x re-probe of winnow_spans after the r8 plan surgery (r7
verdict item 2: candidate doc-set semi-join pushed BELOW the postings
self-join). Reuses scale_probe's corpus builder + warm/cold measure so the
number is comparable to SCALING.md's r7 table (--mode docs-boilerplate
--copies 100 --capped-only, boiler_frac 0.05)."""

import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from scale_probe import build_scaled_docs_dir, measure  # noqa: E402

from s3bigdatasync_spark.session import get_spark  # noqa: E402

NAMES = ["winnow_spans"]


def main():
    spark = get_spark()
    base_dir, scaled_dir = "/tmp/probe_r8w_b1", "/tmp/probe_r8w"
    build_scaled_docs_dir(spark, base_dir, 1, boiler_frac=0.05)
    build_scaled_docs_dir(spark, scaled_dir, 100, boiler_frac=0.05)
    base = measure(spark, base_dir, NAMES)
    scaled = measure(spark, scaled_dir, NAMES)
    out = {
        "probe": "winnow_r8",
        "copies": 100,
        "boiler_frac": 0.05,
        "base1x": base,
        "scaled": scaled,
        "ratio": {
            k: round(scaled[k] / base[k], 2) if base[k] else None for k in base
        },
    }
    print(json.dumps(out))
    with open("/tmp/probe_r8_winnow.json", "w") as f:
        f.write(json.dumps(out))


if __name__ == "__main__":
    main()
