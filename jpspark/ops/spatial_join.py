"""Distributed point-in-polygon spatial join (SURVEY J4).

The reference loads layers into PostGIS precisely so users can run
``ST_Contains`` joins (/root/reference/NOTES.md:96-133,
/root/reference/README.md:3-5). This module is the distributed equivalent,
decomposed as cell-equi-join + exact ray-cast refinement:

  1. polygons -> covering cells at resolution R (bbox polyfill, conservative)
  2. points   -> their cell at R
  3. equi-join on cell_id
  4. exact ray-casting PIP filter (vectorized per candidate polygon)

Two physical strategies (SURVEY §4):

* ``pip_join_broadcast`` — the polygon side (admin boundaries: ~1e5 rows,
  ~100 MB WKB nationwide) is packed into a per-cell candidate index + an
  STR R-tree, broadcast to executors, and the join becomes a single
  ``mapInPandas`` pass over the point table: **zero shuffle of the 10^12-row
  image side**. This is the plan you want at 100 TB — the big side streams
  through map tasks, the small side rides the broadcast.

* ``pip_join_shuffle`` — both sides distributed: polygons exploded onto
  covering cells, hash-partitioned equi-join on ``cell_id`` (AQE skew-join
  splits hot Tokyo/Osaka cells), exact PIP refinement in a grouped kernel.
  Use when the polygon side itself is too large to broadcast.

Skew note: the broadcast path has no join skew by construction (no shuffle).
The shuffle path relies on AQE skew-join plus optional salting of the
explode (``salt_cells``) so one hot cell's candidate pairs split across
``n_salt`` reducers.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..geom import cell, pip, rtree, wkb

try:  # public since Spark 3.x: StructType -> pyarrow schema
    from pyspark.sql.pandas.types import to_arrow_schema
except ImportError:  # pragma: no cover - fallback for API moves
    def to_arrow_schema(schema):
        import pyarrow as pa

        return pa.Schema.from_pandas(
            __import__("pandas").DataFrame(columns=[f.name for f in schema.fields])
        )

DEFAULT_RES = 7


def _ring_parity_grid(pys: np.ndarray, pxs: np.ndarray, pre) -> np.ndarray:
    """Crossing parity of every (row, col) grid center against one prepared
    ring — the EXACT kernel math (pip._ring_pre): same straddle test, same
    ``x1 + (py - y1) * slope`` intersection, same strict ``px < xint``
    count (a center is inside iff the number of crossings with xint > px
    is odd). Fully vectorized: crossings are sparse (row, xint) pairs;
    per row, count-of-crossings <= px accumulates via flip positions +
    cumsum, so cost is O(rings' straddle matrix + crossings + R*C)."""
    x1, y1, y2, slope = pre
    pys_c = pys[:, None]
    straddle = (y1 > pys_c) != (y2 > pys_c)
    xint = x1 + (pys_c - y1) * slope
    r_idx, e_idx = np.nonzero(straddle)
    m = straddle.sum(axis=1)  # crossings per row
    C = len(pxs)
    delta = np.zeros((len(pys), C + 1), dtype=np.int32)
    # first column whose center x >= crossing x: from there on the crossing
    # stops counting as "greater than px"
    j = np.searchsorted(pxs, xint[r_idx, e_idx], side="left")
    np.add.at(delta, (r_idx, j), 1)
    n_le = np.cumsum(delta[:, :C], axis=1)
    return ((m[:, None] - n_le) & 1).astype(bool)


class PolygonIndex:
    """Driver-built, broadcastable index over a polygon table.

    cell_id -> np.ndarray of polygon ordinals; ordinal -> (id, parsed rings,
    bbox). Plus a packed R-tree over polygon bboxes for ad-hoc bbox queries.

    ``settled_cells``: optional fine-grid fast path (the classic
    interior-cell optimization of hierarchical spatial joins). A dense
    grid over the layer's bbox window is built at the finest resolution
    whose window fits the cell budget; any cell NO polygon edge touches is
    "settled" — every point in it has the same containment result as the
    cell center (a boundary would have to cross the cell to change the
    answer) — so assignment is one dense-array gather. Only points in
    boundary-crossed cells run the ray-cast. Settled cells are classified
    by a per-part scanline that reuses the EXACT kernel crossing formula
    (same straddle test, same ``x1 + (py - y1) * slope`` expression, same
    strict comparison), so the fast path is bit-identical to the exact
    path by construction. Grid memory: ``settled_cells`` x ~5 bytes in
    the broadcast (default 4M cells ≈ 17 MB).
    """

    def __init__(
        self,
        ids: list,
        geoms: list[bytes],
        res: int = DEFAULT_RES,
        settled_cells: int | None = 4_000_000,
    ):
        self.res = res
        self.ids = np.asarray(ids, dtype=object)
        # index at PART granularity: a multi-part municipality's islands are
        # separate index entries, so a scattered multipolygon never drags
        # the whole map's points into one candidate test (its whole-geometry
        # bbox would). part -> owning polygon ordinal.
        self.part_owner: list[int] = []
        self.parts: list[pip.PreparedPolygon] = []
        part_rings: list[list[np.ndarray]] = []
        boxes = []
        for ordinal, g in enumerate(geoms):
            for rings in wkb.parse_multipolygon(g):
                ext = rings[0]
                boxes.append(
                    (ext[:, 0].min(), ext[:, 1].min(), ext[:, 0].max(), ext[:, 1].max())
                )
                self.parts.append(pip.PreparedPolygon([rings]))
                self.part_owner.append(ordinal)
                part_rings.append(rings)
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.boxes = boxes
        self.tree = rtree.PackedRTree(boxes, np.arange(len(boxes), dtype=np.int64))
        self.cell_map: dict[int, np.ndarray] = {}
        self.part_cells: list[np.ndarray] = []
        tmp: dict[int, list[int]] = {}
        for pi, (x0, y0, x1, y1) in enumerate(boxes):
            cover = cell.cover_bbox(x0, y0, x1, y1, res)
            self.part_cells.append(cover)
            for c in cover:
                tmp.setdefault(int(c), []).append(pi)
        self.cell_map = {k: np.asarray(v, dtype=np.int64) for k, v in tmp.items()}
        self.settled_res: int | None = None
        self.settled_grid: np.ndarray | None = None
        self._win = (0, 0)  # (gx0, gy0) of the local window at settled_res
        if settled_cells and len(self.parts):
            self._build_settled(part_rings, settled_cells)

    def _pick_settled_res(self, budget: int) -> int | None:
        """Finest resolution whose layer-bbox window fits the cell budget."""
        x0 = self.boxes[:, 0].min()
        y0 = self.boxes[:, 1].min()
        x1 = self.boxes[:, 2].max()
        y1 = self.boxes[:, 3].max()
        best = None
        for fres in range(4, 19):
            gx0, gy0 = cell._grid_xy(x0, y0, fres)
            gx1, gy1 = cell._grid_xy(x1, y1, fres)
            if (int(gx1) - int(gx0) + 1) * (int(gy1) - int(gy0) + 1) > budget:
                break
            best = fres
        return best

    def _build_settled(self, part_rings: list[list[np.ndarray]], budget: int) -> None:
        """Classify every fine cell in the layer-bbox window: ordinal >= 0
        (whole cell inside that polygon), -1 (whole cell outside all), -2
        (a polygon edge touches the cell: exact ray-cast required).

        Edge marking uses inclusive edge bboxes, so any cell whose points
        could disagree with its center is conservatively -2; half-open
        cell borders mean a boundary lying exactly on a border only
        affects the cell that owns it. Classification is a per-part
        scanline over the part's settled rows using the kernel's own
        precomputed (x1, y1, y2, slope) edge tables — bit-identical
        crossing parity, first-wins part order, O(edges + cells)."""
        fres = self._pick_settled_res(budget)
        if fres is None:
            return
        n = 1 << fres
        wx0, wy0 = (int(v) for v in cell._grid_xy(self.boxes[:, 0].min(), self.boxes[:, 1].min(), fres))
        wx1, wy1 = (int(v) for v in cell._grid_xy(self.boxes[:, 2].max(), self.boxes[:, 3].max(), fres))
        W, H = wx1 - wx0 + 1, wy1 - wy0 + 1
        unsettled = np.zeros((H, W), dtype=bool)
        for rings in part_rings:
            for ring in rings:
                xs, ys = ring[:, 0], ring[:, 1]
                gx0, gy0 = cell._grid_xy(np.minimum(xs[:-1], xs[1:]), np.minimum(ys[:-1], ys[1:]), fres)
                gx1, gy1 = cell._grid_xy(np.maximum(xs[:-1], xs[1:]), np.maximum(ys[:-1], ys[1:]), fres)
                gx0 -= wx0
                gx1 -= wx0
                gy0 -= wy0
                gy1 -= wy0
                single = (gx0 == gx1) & (gy0 == gy1)
                unsettled[gy0[single], gx0[single]] = True
                for a, b, c_, d in zip(gx0[~single], gx1[~single], gy0[~single], gy1[~single]):
                    unsettled[c_ : d + 1, a : b + 1] = True
        owner = np.full((H, W), -1, dtype=np.int32)
        owner[unsettled] = -2
        # per-part scanline over its bbox rows, first-wins by part order
        col_x = cell.LON0 + (np.arange(wx0, wx1 + 1) + 0.5) * (360.0 / n)
        row_y = cell.LAT0 + (np.arange(wy0, wy1 + 1) + 0.5) * (180.0 / n)
        for pi, (x0, y0, x1, y1) in enumerate(self.boxes):
            pgx0, pgy0 = (int(v) for v in cell._grid_xy(x0, y0, fres))
            pgx1, pgy1 = (int(v) for v in cell._grid_xy(x1, y1, fres))
            r0, r1 = pgy0 - wy0, pgy1 - wy0
            c0, c1 = pgx0 - wx0, pgx1 - wx0
            rings_pre = self.parts[pi].rings[0]  # one part per PreparedPolygon
            pys = row_y[r0 : r1 + 1]
            pxs = col_x[c0 : c1 + 1]  # ascending
            inside = _ring_parity_grid(pys, pxs, rings_pre[0])
            for hole in rings_pre[1:]:
                if inside.any():
                    inside &= ~_ring_parity_grid(pys, pxs, hole)
            block = owner[r0 : r1 + 1, c0 : c1 + 1]
            take = inside & (block == -1)  # first-wins; -2 (unsettled) excluded
            block[take] = self.part_owner[pi]
        self.settled_res = fres
        self.settled_grid = owner
        self._win = (wx0, wy0)

    @classmethod
    def from_pandas(
        cls, pdf: pd.DataFrame, id_col: str, geom_col: str = "geom",
        res: int = DEFAULT_RES, settled_cells: int | None = 4_000_000,
    ):
        """Build (or reuse) the index for a polygon table. The built index
        is memoized on ``pdf.attrs`` keyed by the build parameters — real
        jobs build the index once and run many batches against it, so
        repeated joins against the same table shouldn't pay the
        (sub-second, but serial) settled-grid construction again."""
        key = ("_jpspark_polygon_index", id_col, geom_col, res, settled_cells)
        cached = pdf.attrs.get(key)
        if cached is not None:
            return cached
        idx = cls(pdf[id_col].tolist(), pdf[geom_col].tolist(), res, settled_cells=settled_cells)
        pdf.attrs[key] = idx
        return idx

    def assign(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Containing polygon id per point (None if outside all)."""
        ords = self.assign_ordinals(px, py)
        out = np.full(len(px), None, dtype=object)
        hit = ords >= 0
        out[hit] = self.ids[ords[hit]]
        return out

    def assign_ordinals(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Vectorized assignment -> int64 polygon ordinal (-1 if outside).
        Settled-grid fast path first (one gather per point); only points in
        boundary cells run the exact per-part ray-cast. Points outside the
        layer-bbox window are outside every polygon by construction."""
        if self.settled_grid is None:
            return self._assign_ordinals_exact(px, py)
        ix, iy = cell._grid_xy(px, py, self.settled_res)
        wx0, wy0 = self._win
        H, W = self.settled_grid.shape
        lx = ix - wx0
        ly = iy - wy0
        inwin = (lx >= 0) & (lx < W) & (ly >= 0) & (ly < H)
        out = np.full(len(px), -1, dtype=np.int64)
        vals = self.settled_grid[ly[inwin], lx[inwin]]
        out[inwin] = vals
        rest = np.zeros(len(px), dtype=bool)
        rest[np.flatnonzero(inwin)[vals == -2]] = True
        if rest.any():
            out[rest] = self._assign_ordinals_exact(px[rest], py[rest])
        return out

    def _assign_ordinals_exact(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Exact path: iteration order is PER PART, gathering all points of
        its covering cells at once — one large vectorized PIP call per
        island instead of many tiny per-(cell,candidate) calls, which is
        what keeps the kernel compute-bound (NumPy dispatch overhead would
        otherwise dominate at ~30 points/call). Returning ordinals (not id
        objects) lets callers materialize the id column with an Arrow
        take() instead of touching millions of Python objects."""
        out = np.full(len(px), -1, dtype=np.int64)
        unassigned = np.ones(len(px), dtype=bool)
        cells = cell.encode(px, py, self.res)
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        starts = np.flatnonzero(np.r_[True, sorted_cells[1:] != sorted_cells[:-1]])
        uniq = sorted_cells[starts]
        ends = np.r_[starts[1:], len(sorted_cells)]
        cell_range = {int(c): (int(s), int(e)) for c, s, e in zip(uniq, starts, ends)}
        for pi in range(len(self.parts)):
            ranges = [cell_range[int(c)] for c in self.part_cells[pi] if int(c) in cell_range]
            if not ranges:
                continue
            idx = np.concatenate([order[s:e] for s, e in ranges])
            x0, y0, x1, y1 = self.boxes[pi]
            bx, by = px[idx], py[idx]
            m = (bx >= x0) & (bx <= x1) & (by >= y0) & (by <= y1) & unassigned[idx]
            idx = idx[m]
            if not len(idx):
                continue
            hit = self.parts[pi].contains(px[idx], py[idx], block=1024)
            got = idx[hit]
            out[got] = self.part_owner[pi]
            unassigned[got] = False
        return out


def pip_join_broadcast(
    points: DataFrame,
    polys_pdf: pd.DataFrame,
    poly_id_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res: int = DEFAULT_RES,
    out_col: str = "poly_id",
    keep_unmatched: bool = False,
    out_type: T.DataType | None = None,
    settled_cells: int | None = 4_000_000,
) -> DataFrame:
    """Broadcast PIP join: annotate each point row with its containing
    polygon's id. No shuffle of the point table; narrow plan.
    ``settled_cells``: budget for the interior-cell fast-path grid (see
    PolygonIndex); None disables it (smaller broadcast, slower kernel)."""
    spark = points.sparkSession
    index = PolygonIndex.from_pandas(
        polys_pdf, poly_id_col, res=res, settled_cells=settled_cells
    )
    bc = spark.sparkContext.broadcast(index)
    if out_type is None:
        # infer from the polygon id dtype (a string default would make the
        # Arrow id array silently mis-typed for integer-keyed layers)
        kind = polys_pdf[poly_id_col].dtype.kind
        out_type = (
            T.LongType() if kind in "iu"
            else T.DoubleType() if kind == "f"
            else T.StringType()
        )
    out_schema = T.StructType(points.schema.fields + [T.StructField(out_col, out_type)])

    # Hot path uses mapInArrow (not mapInPandas): Arrow batches are sized
    # for fat image rows (maxRecordsPerBatch=2048), and constructing a
    # pandas DataFrame per batch costs more than the PIP math itself at
    # 10^6+ rows/task. RecordBatches are coalesced into large chunks
    # (amortizing per-cell dispatch) and converted column-wise to NumPy
    # with zero pandas involvement.
    import pyarrow as pa

    CHUNK_ROWS = 1 << 18
    out_arrow = to_arrow_schema(out_schema)

    def kernel(batches):
        idx: PolygonIndex = bc.value
        # id lookup as an Arrow array: ordinal -> id via C-speed take()
        # (never materializes per-row Python objects)
        ids_arrow = pa.array(list(idx.ids), type=out_arrow.field(out_col).type)

        def flush(buf: list) -> "pa.RecordBatch":
            tbl = pa.Table.from_batches(buf)
            px = tbl.column(lon).to_numpy(zero_copy_only=False)
            py = tbl.column(lat).to_numpy(zero_copy_only=False)
            ords = idx.assign_ordinals(px, py)
            take_idx = pa.array(ords, mask=(ords < 0))  # -1 -> null
            cols = [tbl.column(i).combine_chunks() for i in range(tbl.num_columns)]
            cols.append(ids_arrow.take(take_idx))
            return pa.RecordBatch.from_arrays(cols, schema=out_arrow)

        buf: list = []
        n = 0
        for rb in batches:
            buf.append(rb)
            n += rb.num_rows
            if n >= CHUNK_ROWS:
                yield flush(buf)
                buf, n = [], 0
        if buf:
            yield flush(buf)

    result = points.mapInArrow(kernel, out_schema)
    if not keep_unmatched:
        result = result.filter(F.col(out_col).isNotNull())
    return result


def pip_count_broadcast(
    points: DataFrame,
    polys_pdf: pd.DataFrame,
    poly_id_col: str,
    lon: str = "lon",
    lat: str = "lat",
    res: int = DEFAULT_RES,
    out_col: str = "poly_id",
    out_type: T.DataType | None = None,
    settled_cells: int | None = 4_000_000,
) -> DataFrame:
    """PIP join with AGGREGATE PUSHDOWN: per-polygon point counts,
    (out_col, n_points), computed inside the Arrow kernel.

    Counting points per polygon (the flagship "images per municipality"
    query) never needs per-row assignments to cross the JVM<->Python
    boundary: the kernel bincounts ordinals per chunk and emits ~n_polys
    partial rows instead of the full point table, so the Arrow IPC cost —
    the measured non-scaling floor of the row-annotating form on
    byte-heavy stages — collapses to the input columns only (lon/lat,
    16 B/row; nothing else is even read from the scan). A tiny final
    groupBy sums the partials. This is projection+aggregation pushdown
    through the spatial join, the plan a 10^12-row count wants."""
    spark = points.sparkSession
    index = PolygonIndex.from_pandas(
        polys_pdf, poly_id_col, res=res, settled_cells=settled_cells
    )
    bc = spark.sparkContext.broadcast(index)
    if out_type is None:
        kind = polys_pdf[poly_id_col].dtype.kind
        out_type = (
            T.LongType() if kind in "iu"
            else T.DoubleType() if kind == "f"
            else T.StringType()
        )
    out_schema = T.StructType(
        [T.StructField(out_col, out_type), T.StructField("n_points", T.LongType())]
    )
    import pyarrow as pa

    CHUNK_ROWS = 1 << 19
    out_arrow = to_arrow_schema(out_schema)

    def kernel(batches):
        idx: PolygonIndex = bc.value
        ids_arrow = pa.array(list(idx.ids), type=out_arrow.field(out_col).type)
        n_ids = len(idx.ids)

        def flush(buf: list) -> "pa.RecordBatch":
            tbl = pa.Table.from_batches(buf)
            px = tbl.column(lon).to_numpy(zero_copy_only=False)
            py = tbl.column(lat).to_numpy(zero_copy_only=False)
            ords = idx.assign_ordinals(px, py)
            counts = np.bincount(ords + 1, minlength=n_ids + 1)[1:]  # drop -1
            nz = np.flatnonzero(counts)
            return pa.RecordBatch.from_arrays(
                [ids_arrow.take(pa.array(nz)), pa.array(counts[nz].astype(np.int64))],
                schema=out_arrow,
            )

        buf: list = []
        n = 0
        for rb in batches:
            buf.append(rb)
            n += rb.num_rows
            if n >= CHUNK_ROWS:
                yield flush(buf)
                buf, n = [], 0
        if buf:
            yield flush(buf)

    partials = points.select(lon, lat).mapInArrow(kernel, out_schema)
    return partials.groupBy(out_col).agg(F.sum("n_points").alias("n_points"))


def explode_polygons_to_cells(polys: DataFrame, geom_col: str = "geom", res: int = DEFAULT_RES) -> DataFrame:
    """Polygon side of the shuffle strategy: one row per covering cell.
    Cover is bbox-conservative; exact PIP later removes false positives."""
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def cover_udf(geom: pd.Series) -> pd.Series:
        out = []
        for g in geom:
            x0, y0, x1, y1 = wkb.multipolygon_bbox(bytes(g))
            out.append(cell.cover_bbox(x0, y0, x1, y1, res).tolist())
        return pd.Series(out)

    return polys.withColumn("cell_id", F.explode(cover_udf(F.col(geom_col))))


def attach_cell(points: DataFrame, lon: str = "lon", lat: str = "lat", res: int = DEFAULT_RES) -> DataFrame:
    @F.pandas_udf(T.LongType())
    def cell_udf(lons: pd.Series, lats: pd.Series) -> pd.Series:
        return pd.Series(cell.encode(lons.to_numpy(), lats.to_numpy(), res))

    return points.withColumn("cell_id", cell_udf(F.col(lon), F.col(lat)))


def pip_join_shuffle(
    points: DataFrame,
    polys: DataFrame,
    poly_id_col: str,
    lon: str = "lon",
    lat: str = "lat",
    geom_col: str = "geom",
    res: int = DEFAULT_RES,
    point_id_col: str = "image_id",
    salt_cells: int = 1,
    settled_cells: int | None = 65_536,
    settled_min_points: int = 4_096,
) -> DataFrame:
    """Fully distributed PIP join for a non-broadcastable polygon side.

    Plan: explode polys to (cell_id, poly_id) KEY ROWS ONLY (geometry does
    not ride the explode) -> equi-join points on cell (+ optional salt;
    AQE skew-join handles residual hot cells) -> COGROUP the candidate
    pairs with the polygon table on poly_id -> exact vectorized PIP per
    group, geometry deserialized once per (polygon, salt) group rather
    than shuffled once per candidate pair. Salting splits one hot
    polygon's candidates across ``salt_cells`` groups.

    ``settled_cells``/``settled_min_points``: the interior-cell fast path
    the broadcast strategy uses, ported to the shuffle path (round-4
    VERDICT #6). A group holds ONE polygon and its candidates, so the
    kernel builds a single-polygon :class:`PolygonIndex` (per-polygon-bbox
    settled grid, <= ``settled_cells`` cells) whenever the group carries
    at least ``settled_min_points`` candidates — exactly the hot
    Tokyo/Osaka groups where skew concentrates — and resolves
    settled-cell points by one gather; only boundary-cell points pay the
    ray-cast. Bit-identical to the exact kernel by the same construction
    the broadcast path proves. Small groups skip the grid build
    (``settled_cells=None`` disables it everywhere).
    """
    pts = attach_cell(points.select(point_id_col, lon, lat), lon, lat, res)
    pol_cells = explode_polygons_to_cells(
        polys.select(poly_id_col, geom_col), geom_col, res
    ).select(F.col(poly_id_col).alias("__pid"), "cell_id")
    cand = pts.join(pol_cells, "cell_id")
    geo_side = polys.select(F.col(poly_id_col).alias("__pid"), geom_col)
    if salt_cells > 1:
        cand = cand.withColumn(
            "__salt", (F.crc32(F.col(point_id_col).cast("string")) % salt_cells).cast("int")
        )
        geo_side = geo_side.withColumn(
            "__salt", F.explode(F.array([F.lit(i) for i in range(salt_cells)]))
        )
        group_keys = ["__pid", "__salt"]
    else:
        group_keys = ["__pid"]

    out_schema = T.StructType(
        [
            T.StructField(point_id_col, points.schema[point_id_col].dataType),
            T.StructField(lon, T.DoubleType()),
            T.StructField(lat, T.DoubleType()),
            T.StructField("poly_id", polys.schema[poly_id_col].dataType),
        ]
    )

    def refine(cand_pdf: pd.DataFrame, geo_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(cand_pdf) or not len(geo_pdf):
            return pd.DataFrame({f.name: pd.Series(dtype=object) for f in out_schema.fields})
        px = cand_pdf[lon].to_numpy()
        py = cand_pdf[lat].to_numpy()
        geom = bytes(geo_pdf[geom_col].iloc[0])
        if settled_cells and len(cand_pdf) >= settled_min_points:
            # hot-group fast path: single-polygon settled grid; the group
            # IS one polygon, so first-wins == independent containment
            idx = PolygonIndex([0], [geom], res, settled_cells=settled_cells)
            hit = idx.assign_ordinals(px, py) >= 0
        else:
            hit = pip.PreparedPolygon(wkb.parse_multipolygon(geom)).contains(px, py)
        out = cand_pdf.loc[hit, [point_id_col, lon, lat]].copy()
        out["poly_id"] = geo_pdf["__pid"].iloc[0]
        return out

    return (
        cand.groupBy(*group_keys)
        .cogroup(geo_side.groupBy(*group_keys))
        .applyInPandas(refine, out_schema)
    )
