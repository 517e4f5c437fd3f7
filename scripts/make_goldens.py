"""Generate the golden oracle tables (FIXTURES.md §7) into tests/golden/.

Pure-Python/NumPy oracles — no Spark involved — so the goldens are an
independent reference for the distributed operators. Deterministic
(seed=42 fixtures); regenerating must be a no-op unless fixtures change.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jpspark import fixtures as fx  # noqa: E402
from jpspark.geom import cell, wkb  # noqa: E402
from jpspark.ops.text import a40_normalize_range  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")
N_IMG, N_MUNI, K = 1000, 50, 5
TILE_Z = 6


def main():
    os.makedirs(OUT, exist_ok=True)
    polys = fx.admin_polygons(N_MUNI)
    images = fx.images(N_IMG, polys)
    fac = fx.facilities(200, polys)
    lon = images["lon"].to_numpy()
    lat = images["lat"].to_numpy()

    # golden_pip: exact PIP assignment (pure ray-casting oracle)
    assigned = fx.pip_assign_oracle(lon, lat, polys)
    pd.DataFrame({"image_id": images["image_id"], "全国地方公共団体コード": assigned}).to_parquet(
        f"{OUT}/golden_pip.parquet", index=False
    )

    # golden_tile_assign: (tile_z, tile_x, tile_y, cell_id, image_id)
    n = 1 << TILE_Z
    tx = np.clip(np.floor((lon - cell.LON0) / 360.0 * n), 0, n - 1).astype(np.int64)
    ty = np.clip(np.floor((lat - cell.LAT0) / 180.0 * n), 0, n - 1).astype(np.int64)
    pd.DataFrame(
        {
            "tile_z": TILE_Z,
            "tile_x": tx,
            "tile_y": ty,
            "cell_id": cell.from_xy(tx, ty, TILE_Z),
            "image_id": images["image_id"],
        }
    ).to_parquet(f"{OUT}/golden_tile_assign.parquet", index=False)

    # golden_knn: (image_id, rank, facility_ogc_fid, dist) k=5
    knn = fx.knn_oracle(
        lon, lat, fac["lon"].to_numpy(), fac["lat"].to_numpy(), fac["ogc_fid"].to_numpy(), K
    )
    knn["image_id"] = images["image_id"].to_numpy()[knn["query_idx"]]
    knn.rename(columns={"target_id": "facility_ogc_fid"})[
        ["image_id", "rank", "facility_ogc_fid", "dist"]
    ].to_parquet(f"{OUT}/golden_knn.parquet", index=False)

    # golden_dissolve: per-prefecture vertex-set hash + part count + area
    rows = []
    for pref, grp in polys.groupby("都道府県名", sort=True):
        verts = np.vstack(
            [rings[0] for g in grp["geom"] for rings in wkb.parse_multipolygon(g)]
        )
        vset = np.unique(np.round(verts, 9), axis=0)
        import hashlib

        h = hashlib.md5(vset.tobytes()).hexdigest()
        rows.append(
            {
                "都道府県名": pref,
                "vertex_set_md5": h,
                "n_parts": int(sum(len(wkb.parse_multipolygon(g)) for g in grp["geom"])),
                "area": float(sum(wkb.multipolygon_area(g) for g in grp["geom"])),
            }
        )
    pd.DataFrame(rows).to_parquet(f"{OUT}/golden_dissolve.parquet", index=False)

    # golden_a40: normalization cases from NOTES.md
    cases = ["0.5m以上1.0m未満", "5m以上", "0.3m未満", "2.0m以上3.5m未満", "10m以上"]
    expected = ["0.5m-1m", "5m-", "-0.3m", "2m-3.5m", "10m-"]
    lows = [0.5, 5.0, -99.0, 2.0, 10.0]
    highs = [1.0, 99.0, 0.3, 3.5, 99.0]
    pd.DataFrame(
        {"raw_range": cases, "normalized": expected, "min": lows, "max": highs}
    ).to_parquet(f"{OUT}/golden_a40.parquet", index=False)

    print(f"wrote 5 golden tables to {OUT}")


if __name__ == "__main__":
    main()
