"""Per-tier wall profile of mm_media_features (r15 optimization).

Times, with a warm session: the full query, then feats and each tier
frame in isolation (noop sink). Usage:
    python tools/profile_mm.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from person_linkage_case_study_spark import queries as catalog
from person_linkage_case_study_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("profile-mm")

    def t(label, df):
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"mm-tier {label}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(f"{label:10s} min {min(walls):6.2f}s  runs {[round(w,2) for w in walls]}")

    # warm: one full run
    t("FULL", catalog.mm_media_features(spark, sf_dir))
    feats, tiers = catalog._mm_tier_frames(spark, sf_dir)
    t("feats", feats)
    for name, df in tiers.items():
        t(name, df)
    t("FULL2", catalog.mm_media_features(spark, sf_dir))


if __name__ == "__main__":
    main()
