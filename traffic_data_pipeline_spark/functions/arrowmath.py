"""Arrow-native exact-decimal kernels for the embedding family.

Round-10 optimization (guide §4.2): the Gram / second-moment work of
``embedding_whitening_stats`` was a JVM higher-order-function explode —
``flatten(transform(sequence...))`` building 2080 ``named_struct``s with a
``CAST(double AS DECIMAL(30,12))`` per element, then exploding N x 2080
rows into a hash aggregate. Higher-order lambdas are interpreted (no
codegen) and every element allocates a BigDecimal: measured 5.8 s of the
query's 6.9 s at sf0.1, with the explode alone at 4.3 s. The kernel here
computes the identical per-element quantity vectorized in NumPy and ships
ONE (d*(d+1)/2)-row integer partial per task — the map-side-combine the
explode plan only approximated.

Exactness contract (why this is the SAME number, not an approximation):

- Embedding elements are float32; widened to float64 they are exact, and
  the product of two float32s has at most 48 significand bits, so the
  float64 product is the EXACT real product — NumPy and the JVM compute
  bit-identical ``p``.
- Spark's ``CAST(p AS DECIMAL(30,12))`` goes through
  ``BigDecimal.valueOf(p)`` (the shortest round-trip decimal string of
  ``p``) then ``setScale(12, HALF_UP)``. The kernel computes
  ``round_half_up(p * 1e12)`` vectorized, which agrees except possibly
  within a guard band around ties: ``|p| <= 0.34`` here so
  ``|p*1e12| <= 3.4e11``, whose float64 evaluation carries at most
  ~1.5e-4 absolute error — every element whose fractional part lands
  within ``_TIE_BAND`` (1e-3) of 0.5 is recomputed exactly via
  ``Decimal(repr(p))`` (Python's shortest round-trip repr, the same
  string contract as ``BigDecimal.valueOf``). Outside the band the
  vectorized rounding is provably correct; inside it the scalar path is
  exact by construction.
- Per-task partial sums are int64 in units of 1e-12. Integer sums are
  associative and exact, so the result is partition-invariant, and the
  cross-task fold in Spark sums DECIMAL(38,0) units (no overflow before
  ~1e26 units; a 128 MB scan task of 64-dim float32 rows tops out near
  1.7e17 units). The final ``units/1e12`` division: the unit total is an
  exact int64 (< 2^53 for any bench fixture) and 1e12 is an exactly
  representable double, so one IEEE division returns the correctly
  rounded double of the true rational — identical to casting the exact
  DECIMAL sum to DOUBLE.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Iterator

_TIE_BAND = 1e-3
_UNIT_SCALE = 12  # DECIMAL(30,12) — the similarity-family dot contract


def _units_exact(p: float, scale: int = _UNIT_SCALE) -> int:
    """Exact HALF_UP units of one product — the scalar tie-band path.
    ``Decimal(repr(p))`` mirrors ``BigDecimal.valueOf(p)``: both parse
    the shortest decimal string that round-trips to ``p``."""
    return int(Decimal(repr(p)).scaleb(scale)
               .quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _round_units(P, scale: int = _UNIT_SCALE):
    """Vectorized HALF_UP(P * 10^scale) with the exact tie-band fixup.
    Returns int64 units, elementwise equal to Spark's
    CAST(P AS DECIMAL(p,scale)) in 10^-scale units (default: the
    DECIMAL(30,12) similarity contract; scale 6 serves the dsum
    DECIMAL(18,6) contract).

    The suspect band scales with |P| (ADVICE r10 #2): the float64
    evaluation of ``P * 1e12`` carries absolute error up to
    ``|P*1e12| * 2^-53``, which outgrows the fixed 1e-3 band once
    |P| ~ 4.5 — so the band is ``max(1e-3, |F| * 2^-51)`` (two ulps of
    the multiply, double the worst case). Elements with |F| >= 2^50
    always take the exact path: beyond it float64 cannot carry
    sub-unit precision, so the vectorized frac test is meaningless."""
    import numpy as np

    F = P * (10.0 ** scale)
    A = np.abs(F)
    R = np.floor(A + 0.5)
    frac = A - np.floor(A)
    if not np.isfinite(F).all():
        # a NaN/inf product would cast to int64 platform-undefined and
        # silently corrupt the accumulator (ADVICE r10 #1) — the JVM twin
        # (ANSI CAST(double AS DECIMAL)) raises on these too; fail loudly
        raise ValueError("non-finite product in exact-decimal kernel")
    U = (np.sign(F) * R).astype(np.int64)
    band = np.maximum(_TIE_BAND, A * 4.5e-16)
    sus = (np.abs(frac - 0.5) < band) | (A >= 2.0 ** 50)
    if sus.any():
        flatP = P[sus]
        U[sus] = [_units_exact(float(p), scale) for p in flatP.ravel()]
    return U


def with_exact_dot(df, a_col: str, b_col: str, alias: str):
    """Append ``alias`` = the decimal-exact dot product of two vector
    columns (the ``similarity.dot_product`` contract: per-element
    CAST(x*y AS DECIMAL(30,12)), exact decimal sum, cast DOUBLE) and drop
    the two vector columns; every other column passes through untouched.

    Drop-in for ``withColumn(alias, dot_product(a, b))`` on pair frames —
    the JVM form runs interpreted zip_with/aggregate lambdas with a
    BigDecimal per element (~600 ns/element measured); this kernel is the
    vectorized tie-band path of ``_round_units`` (same exactness proof as
    the module docstring: unit sums stay < 2^53 for any dim under ~2e4,
    so ``units/1e12`` is the correctly rounded double of the exact
    decimal sum). NULL/length-mismatch rows yield NULL, matching
    zip_with's null-padding poisoning the decimal fold.
    """
    import pyarrow  # noqa: F401 — fail fast at plan time, not in tasks

    fields = [f for f in df.schema.fields if f.name not in (a_col, b_col)]
    pass_names = [f.name for f in fields]
    out_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in fields]
        + [f"`{alias}` double"])

    def kernel(it):
        import numpy as np
        import pyarrow as pa

        for batch in it:
            names = batch.schema.names
            a = batch.column(names.index(a_col))
            b = batch.column(names.index(b_col))
            n = batch.num_rows
            dots: "np.ndarray" = np.full(n, np.nan, dtype=np.float64)
            ok = np.zeros(n, dtype=bool)
            a_off = a.offsets.to_numpy(zero_copy_only=False)
            b_off = b.offsets.to_numpy(zero_copy_only=False)
            a_flat = a.values.to_numpy(zero_copy_only=False).astype(
                np.float64)
            b_flat = b.values.to_numpy(zero_copy_only=False).astype(
                np.float64)
            a_len = np.diff(a_off)
            b_len = np.diff(b_off)
            valid = (np.asarray(a.is_valid()) & np.asarray(b.is_valid())
                     & (a_len == b_len))
            if a.values.null_count or b.values.null_count:
                # null ELEMENTS poison the decimal fold to NULL: keep
                # rows containing one invalid (never in the fixtures)
                av = np.asarray(a.values.is_valid())
                bv = np.asarray(b.values.is_valid())
                for r in np.where(valid)[0]:
                    if (not av[a_off[r]:a_off[r + 1]].all()
                            or not bv[b_off[r]:b_off[r + 1]].all()):
                        valid[r] = False
            for d in np.unique(a_len[valid]):
                d = int(d)
                rows = np.where(valid & (a_len == d))[0]
                if d == 0:
                    dots[rows] = 0.0  # empty fold: decimal 0 -> 0.0
                    ok[rows] = True
                    continue
                ai = (a_off[rows][:, None] + np.arange(d)[None, :]).ravel()
                bi = (b_off[rows][:, None] + np.arange(d)[None, :]).ravel()
                P = (a_flat[ai] * b_flat[bi]).reshape(-1, d)
                units = _round_units(P).sum(axis=1)
                dots[rows] = units.astype(np.float64) / 1.0e12
                ok[rows] = True
            arrays = [batch.column(names.index(p)) for p in pass_names]
            arrays.append(pa.array(dots, type=pa.float64(), mask=~ok))
            yield pa.RecordBatch.from_arrays(arrays, names=pass_names
                                             + [alias])

    return df.mapInArrow(kernel, out_ddl)


def gram_units(it: Iterator["pyarrow.RecordBatch"],  # noqa: F821
               ) -> Iterator["pyarrow.RecordBatch"]:  # noqa: F821
    """mapInArrow kernel: per-task upper-triangle Gram partial in exact
    1e-12 units. Input: one ``embedding`` list<float> column. Output:
    (i, j, u) with 1-based i <= j — at most d(d+1)/2 rows per task.

    Rows are processed in slabs so the (rows, d, d) product tensor stays
    small; ragged lengths fall back to per-length slabs (positions are
    row-local, so accumulators of different d pad-merge exactly)."""
    import numpy as np
    import pyarrow as pa

    accs: dict[int, "np.ndarray"] = {}  # d -> (d, d) int64 accumulator
    # d -> (d, d) bool: some NON-NULL product contributed to the key.
    # Null ELEMENTS (ADVICE r10 #1) mirror the explode plan's F.sum
    # semantics: a null element's products are nulls the sum SKIPS
    # (== adds zero), and a key whose every product is null sums to
    # NULL, not 0 — so null elements contribute 0 units here and the
    # mask downgrades an all-null key's partial to NULL.
    nns: dict[int, "np.ndarray"] = {}
    SLAB = 512
    for batch in it:
        col = batch.column(0)
        if isinstance(col, pa.ChunkedArray):  # pragma: no cover
            chunks = col.chunks
        else:
            chunks = [col]
        for arr in chunks:
            arr = arr.combine_chunks() if hasattr(arr, "combine_chunks") \
                else arr
            offsets = arr.offsets.to_numpy(zero_copy_only=False)
            flat = arr.values.to_numpy(zero_copy_only=False).astype(
                np.float64)
            if arr.values.null_count:
                vflat = np.asarray(arr.values.is_valid())
                flat = np.where(vflat, flat, 0.0)
            else:
                vflat = None
            lens = np.diff(offsets)
            valid = np.asarray(arr.is_valid())
            for d in np.unique(lens[valid]):
                d = int(d)
                if d == 0:
                    continue
                rows = np.where(valid & (lens == d))[0]
                starts = offsets[rows]
                idx = (starts[:, None] + np.arange(d)[None, :]).ravel()
                E = flat[idx].reshape(-1, d)
                acc = accs.setdefault(d, np.zeros((d, d), dtype=np.int64))
                nn = nns.setdefault(d, np.zeros((d, d), dtype=bool))
                if vflat is None:
                    nn[:] = True
                else:
                    V = vflat[idx].reshape(-1, d)
                    for s in range(0, V.shape[0], SLAB):
                        Vs = V[s:s + SLAB]
                        nn |= (Vs[:, :, None] & Vs[:, None, :]).any(axis=0)
                for s in range(0, E.shape[0], SLAB):
                    Es = E[s:s + SLAB]
                    P = Es[:, :, None] * Es[:, None, :]
                    acc += _round_units(P).sum(axis=0)
    if accs:
        dmax = max(accs)
        total = np.zeros((dmax, dmax), dtype=np.int64)
        nn_total = np.zeros((dmax, dmax), dtype=bool)
        for d, acc in accs.items():
            total[:d, :d] += acc
            nn_total[:d, :d] |= nns[d]
        iu, ju = np.triu_indices(dmax)
        yield pa.RecordBatch.from_arrays(
            [pa.array((iu + 1).astype(np.int64)),
             pa.array((ju + 1).astype(np.int64)),
             pa.array(total[iu, ju], mask=~nn_total[iu, ju])],
            names=["i", "j", "u"])
    else:  # empty task: emit nothing (the groupBy fold tolerates it)
        return


# ---------------------------------------------------------------------------
# Product-quantization kernels (round 11, guide §4.2) — the PQ trio
# (embedding_pq_adc / pq_distortion_report / ivfpq_query) and the
# streaming_pq_codes handler shared a (vec x subspace x centroid)
# explode/broadcast-join/window plan whose per-element decimal CASTs ran
# interpreted. These kernels compute the identical quantities vectorized
# per task from ONE pass over the embedding column.
#
# Exactness contract (extends the module docstring):
# - (x - c) is one IEEE double subtraction and (x-c)^2 one multiplication,
#   both correctly rounded — NumPy and the JVM produce bit-identical
#   doubles from the same float32 inputs.
# - CAST(p AS DECIMAL(30,12)) is _round_units(p) (tie-band-exact).
# - A per-(vec, m, cid) distance is an int64 unit sum over <= dsub
#   elements; the kernel asserts every such sum < 4096 * 1e12 units,
#   which guarantees BOTH that distinct unit totals map to distinct
#   doubles AND that Spark's re-quantization CAST(d2_double AS
#   DECIMAL(30,12)) recovers the unit total exactly (half-ulp of a
#   double < 4096 is < 5e-13, the HALF_UP decision radius at scale 12).
#   The ADC / exact / coarse totals are asserted < 2^53 so their final
#   units/1e12 division is the correctly rounded double of the exact
#   decimal sum.
# - Argmin over (d2 double ASC, cid ASC) == argmin over (units, cid)
#   (distinct int64 units < 2^53 give distinct, order-preserving
#   doubles); np.argmin's first-minimum IS the cid tiebreak because
#   centroid rows are ordered by cid.
#
# The codebook is a bounded creation-time artifact (K*dim floats) —
# collecting it to the driver is the sanctioned bounded-scalar class
# (same as the k-means centroid collect), not a data-sized collect.

_PQ_D2_UNIT_CAP = int(4096 * 10 ** 12)  # d2 < 4096: decimal round-trip proof
_PQ_SUM_CAP = 2 ** 53                   # exact int64 -> double division


def collect_codebook(df, k: int, vec_col: str = "embedding",
                     id_col: str = "vec_id"):
    """Driver-side bounded collect of the K codebook vectors
    (``id_col < k`` — the registered PQ seeding convention). Returns a
    (k, dim) float64 ndarray whose row index IS the centroid id.
    Asserts the codebook is dense (ids 0..k-1), uniform-width and
    null-free: a ragged codebook is a broken index, and failing loudly
    here beats silently diverging from the SQL join semantics."""
    import numpy as np
    from pyspark.sql import functions as F

    rows = (df.filter(F.col(id_col) < k)
            .select(id_col, vec_col).collect())
    got = {int(r[0]): r[1] for r in rows}
    if sorted(got) != list(range(k)):
        raise ValueError(f"codebook ids not dense 0..{k - 1}: {sorted(got)}")
    dims = {len(v) for v in got.values() if v is not None}
    if len(dims) != 1 or any(v is None for v in got.values()):
        raise ValueError(f"codebook not uniform/non-null: dims={dims}")
    C = np.array([[float(x) for x in got[c]] for c in range(k)],
                 dtype=np.float64)
    if not np.isfinite(C).all() or any(x is None
                                       for v in got.values() for x in v):
        raise ValueError("codebook contains null/non-finite elements")
    return C


def _pq_unit_tensor(X, C, dsub: int):
    """(R, d) corpus slab x (K, dc) codebook -> (R, K, M) int64 unit
    tensor of per-subspace squared distances, M = ceil(min(d, dc)/dsub).
    Only overlapping element positions contribute — exactly the rows the
    SQL join on (m, j) produces for a length-d vector."""
    import numpy as np

    d = X.shape[1]
    dc = C.shape[1]
    dov = min(d, dc)
    m_blocks = (dov + dsub - 1) // dsub
    if m_blocks == 0:
        return np.zeros((X.shape[0], C.shape[0], 0), dtype=np.int64)
    D = X[:, None, :dov] - C[None, :, :dov]
    U = _round_units(D * D)
    pad = m_blocks * dsub - dov
    if pad:
        U = np.pad(U, ((0, 0), (0, 0), (0, pad)))
    return U.reshape(X.shape[0], C.shape[0], m_blocks, dsub).sum(axis=3)


def _pq_iter_slabs(batch, id_col: str, vec_col: str, slab: int = 256):
    """Yield (ids int64 ndarray, X (R, d) float64 ndarray) slabs of
    uniform row length from one record batch. Raises on null vectors /
    null elements (never in the fixtures; the SQL twin would need the
    sum-skips-null replay these kernels deliberately do not carry)."""
    import numpy as np

    names = batch.schema.names
    vec = batch.column(names.index(vec_col))
    ids = batch.column(names.index(id_col)).to_numpy(zero_copy_only=False)
    if vec.null_count or vec.values.null_count:
        raise ValueError("pq kernel: null vector/element in input")
    offsets = vec.offsets.to_numpy(zero_copy_only=False)
    flat = vec.values.to_numpy(zero_copy_only=False).astype(np.float64)
    lens = np.diff(offsets)
    for d in np.unique(lens):
        d = int(d)
        if d == 0:
            continue  # no elems rows -> absent from every PQ frame
        rows = np.where(lens == d)[0]
        for s in range(0, len(rows), slab):
            rs = rows[s:s + slab]
            idx = (offsets[rs][:, None] + np.arange(d)[None, :]).ravel()
            yield ids[rs], flat[idx].reshape(-1, d)


def pq_adc_frame(df, cents, dsub: int, query_id: int,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
    """One-pass ADC scan: (id, adc_d2, exact_d2) per vector, replacing
    the sub-explode + broadcast-join + argmin-window + two decimal
    re-aggregations of the embedding_pq_adc plan. ``query_id`` must be a
    codebook row (the registered convention: the query IS centroid
    ``query_id``), so the exact distance falls out of the same tensor."""
    import numpy as np

    C = np.ascontiguousarray(cents, dtype=np.float64)
    if not 0 <= query_id < C.shape[0]:
        raise ValueError("query_id must index a codebook row")
    qU = _pq_unit_tensor(C[query_id][None, :], C, dsub)[0]  # (K, Mq)
    if qU.size and int(qU.max()) >= _PQ_D2_UNIT_CAP:
        raise ValueError("pq kernel: query d2 exceeds the decimal "
                         "round-trip bound (see module docstring)")
    mq = qU.shape[1]

    def kernel(it):
        import pyarrow as pa

        for batch in it:
            for ids, X in _pq_iter_slabs(batch, id_col, vec_col):
                U3 = _pq_unit_tensor(X, C, dsub)  # (R, K, M)
                if int(U3.max(initial=0)) >= _PQ_D2_UNIT_CAP:
                    raise ValueError("pq kernel: d2 exceeds the decimal "
                                     "round-trip bound")
                mv = U3.shape[2]
                mm = min(mv, mq)
                if mm == 0:
                    continue
                codes = U3.argmin(axis=1)  # (R, M): first min == cid tie
                adcu = qU[codes[:, :mm], np.arange(mm)[None, :]].sum(axis=1)
                exactu = U3[:, query_id, :].sum(axis=1)
                if max(int(adcu.max()), int(exactu.max())) >= _PQ_SUM_CAP:
                    raise ValueError("pq kernel: unit total >= 2^53")
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ids),
                     pa.array(adcu.astype(np.float64) / 1.0e12),
                     pa.array(exactu.astype(np.float64) / 1.0e12)],
                    names=[id_col, "adc_d2", "exact_d2"])

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInArrow(
        kernel, f"`{id_col}` {id_type}, adc_d2 double, exact_d2 double")


def pq_codes_frame(df, cents, dsub: int,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """One-pass PQ code assignment: (id, m int, code bigint) rows — the
    streaming_pq_codes per-batch body without the explode/join/window."""
    import numpy as np

    C = np.ascontiguousarray(cents, dtype=np.float64)

    def kernel(it):
        import pyarrow as pa

        for batch in it:
            for ids, X in _pq_iter_slabs(batch, id_col, vec_col):
                U3 = _pq_unit_tensor(X, C, dsub)
                if int(U3.max(initial=0)) >= _PQ_D2_UNIT_CAP:
                    raise ValueError("pq kernel: d2 exceeds the decimal "
                                     "round-trip bound")
                mv = U3.shape[2]
                if mv == 0:
                    continue
                codes = U3.argmin(axis=1)  # (R, M)
                r = X.shape[0]
                yield pa.RecordBatch.from_arrays(
                    [pa.array(np.repeat(ids, mv)),
                     pa.array(np.tile(np.arange(mv, dtype=np.int32), r)),
                     pa.array(codes.astype(np.int64).ravel())],
                    names=[id_col, "m", "code"])

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInArrow(
        kernel, f"`{id_col}` {id_type}, m int, code bigint")


def pq_distortion_partials(df, cents, dsub: int,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding"):
    """Per-task distortion partials: (m int, n bigint, u decimal(38,0))
    where n counts vectors having subspace m and u sums their assigned-
    codeword d2 in exact 1e-12 units (Python-int accumulation — no
    overflow at any task size; the cross-task fold stays in Spark)."""
    import numpy as np

    C = np.ascontiguousarray(cents, dtype=np.float64)

    def kernel(it):
        import pyarrow as pa

        units: dict[int, int] = {}
        counts: dict[int, int] = {}
        for batch in it:
            for _ids, X in _pq_iter_slabs(batch, id_col, vec_col):
                U3 = _pq_unit_tensor(X, C, dsub)
                if int(U3.max(initial=0)) >= _PQ_D2_UNIT_CAP:
                    raise ValueError("pq kernel: d2 exceeds the decimal "
                                     "round-trip bound")
                best = U3.min(axis=1)  # (R, M) assigned-codeword d2 units
                for m in range(U3.shape[2]):
                    units[m] = units.get(m, 0) + int(best[:, m].sum(
                        dtype=object))
                    counts[m] = counts.get(m, 0) + X.shape[0]
        if units:
            from decimal import Decimal
            ms = sorted(units)
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.array(ms, dtype=np.int32)),
                 pa.array(np.array([counts[m] for m in ms],
                                   dtype=np.int64)),
                 pa.array([Decimal(units[m]) for m in ms],
                          type=pa.decimal128(38, 0))],
                names=["m", "n", "u"])

    return df.select(id_col, vec_col).mapInArrow(
        kernel, "m int, n bigint, u decimal(38,0)")


def ivfpq_candidates_frame(df, cents, dsub: int, query_id: int,
                           kc: int, nprobe: int,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding"):
    """One-pass IVFADC: coarse-assign each vector to its nearest of the
    first ``kc`` codebook rows (full-vector d2, id tiebreak), keep only
    vectors whose list is among the query's ``nprobe`` nearest lists
    (computed driver-side from the codebook — the query is codebook row
    ``query_id``), and emit (id, list_id, adc_d2, exact_d2) for the
    candidates. Replaces the 4-localCheckpoint chain of
    embedding_ivfpq_query with a single narrow pass + TakeOrdered."""
    import numpy as np

    C = np.ascontiguousarray(cents, dtype=np.float64)
    if not 0 <= query_id < C.shape[0] or kc > C.shape[0]:
        raise ValueError("query_id/kc must index codebook rows")
    qU = _pq_unit_tensor(C[query_id][None, :], C, dsub)[0]  # (K, Mq)
    if qU.size and int(qU.max()) >= _PQ_D2_UNIT_CAP:
        raise ValueError("pq kernel: query d2 exceeds the decimal "
                         "round-trip bound")
    mq = qU.shape[1]
    qcd2 = qU[:kc, :].sum(axis=1)  # query -> coarse-centroid unit d2
    if qcd2.size and int(qcd2.max()) >= _PQ_SUM_CAP:
        raise ValueError("pq kernel: coarse unit total >= 2^53")
    # ORDER BY (d2 double, cc) == (units, cc); stable argsort keeps the
    # cc tiebreak for equal units
    probe = set(np.argsort(qcd2, kind="stable")[:nprobe].tolist())

    def kernel(it):
        import pyarrow as pa

        for batch in it:
            for ids, X in _pq_iter_slabs(batch, id_col, vec_col):
                U3 = _pq_unit_tensor(X, C, dsub)
                if int(U3.max(initial=0)) >= _PQ_D2_UNIT_CAP:
                    raise ValueError("pq kernel: d2 exceeds the decimal "
                                     "round-trip bound")
                mv = U3.shape[2]
                mm = min(mv, mq)
                if mm == 0:
                    continue
                cd2 = U3[:, :kc, :].sum(axis=2)  # (R, KC)
                if int(cd2.max(initial=0)) >= _PQ_SUM_CAP:
                    raise ValueError("pq kernel: coarse unit total >= 2^53")
                lists = cd2.argmin(axis=1)  # first min == cc tiebreak
                keep = (np.isin(lists, list(probe))
                        & (ids != query_id))
                if not keep.any():
                    continue
                Uk = U3[keep]
                idk = ids[keep]
                lk = lists[keep]
                codes = Uk.argmin(axis=1)
                adcu = qU[codes[:, :mm], np.arange(mm)[None, :]].sum(axis=1)
                exactu = Uk[:, query_id, :].sum(axis=1)
                if max(int(adcu.max()), int(exactu.max())) >= _PQ_SUM_CAP:
                    raise ValueError("pq kernel: unit total >= 2^53")
                yield pa.RecordBatch.from_arrays(
                    [pa.array(idk),
                     pa.array(lk.astype(np.int64)),
                     pa.array(adcu.astype(np.float64) / 1.0e12),
                     pa.array(exactu.astype(np.float64) / 1.0e12)],
                    names=[id_col, "list_id", "adc_d2", "exact_d2"])

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInArrow(
        kernel, f"`{id_col}` {id_type}, list_id bigint, "
                "adc_d2 double, exact_d2 double")


def units_as_double(col, scale: int = _UNIT_SCALE):
    """Column expression: exact double of a 1e-12-unit integer total —
    ``CAST(units AS DECIMAL(26,0)) / 1e12`` lands on DECIMAL(38,12) by
    Spark's precision-adjustment rule (intDigits 26 keeps scale 12), an
    EXACT division for any unit total < 1e26 (the documented kernel
    bound; ANSI overflow raises loudly past it), and the final cast to
    double is then the correctly rounded value at ANY magnitude. This
    replaces ``units.cast('double') / 1e12``, which double-rounds once
    the total exceeds 2^53 (ADVICE r10 #3; verified divergent at
    2^53 + 1 and fixed by this form)."""
    from decimal import Decimal as _D

    from pyspark.sql import functions as F

    # (26,0)/(scale+1,0) stays exact for every scale in use: the
    # precision-adjusted result keeps >= ``scale`` fractional digits
    # (scale 12 -> DECIMAL(38,12), scale 6 -> DECIMAL(34,8))
    return (col.cast("decimal(26,0)")
            / F.lit(_D(10) ** scale)).cast("double")


def with_vec_stats(df, vec_col: str = "embedding", *,
                   norm_alias: str | None = None,
                   bucket_alias: str | None = None,
                   n_planes: int = 8,
                   drop_vec: bool = False):
    """Append the decimal-exact squared norm and/or the hyperplane-LSH
    bucket code of a vector column in ONE vectorized pass; every input
    column (including the vector) passes through untouched.

    Round-11 (guide §4.2): ``similarity.norm_sq`` and
    ``similarity.bucket_code`` are interpreted zip_with/aggregate HOFs
    with a BigDecimal per element — n_planes + 1 of them per row in the
    ann/dedup family's corpus projections. The kernel computes the
    identical quantities:

    - norm: per-element x*x (exact in float64 for float32 inputs),
      CAST DECIMAL(30,12) == _round_units, exact int64 unit sum,
      units/1e12 (< 2^53 asserted) — the with_exact_dot contract with
      both sides the same column. NULL vector / NULL element -> NULL
      (zip_with's null poisons the decimal fold); empty vector -> 0.0.
    - bucket: plane weights are the exact integer recurrence
      ((p*73856093 + pos*19349663) % 1000003) / 1000003.0 - 0.5
      evaluated in int64 then one correctly-rounded double division —
      bit-identical to the JVM expression; per-plane products are
      correctly rounded doubles of identical inputs, unit sums exact,
      and bit p is set iff the unit sum >= 0 (the double cast preserves
      sign and 0 -> 0.0 >= 0). NULL vector / NULL element -> every
      plane dot NULL -> every CASE falls to otherwise(0) -> bucket 0;
      empty vector -> every dot 0.0 -> all bits set.
    """
    import pyarrow  # noqa: F401 — fail fast at plan time, not in tasks

    if norm_alias is None and bucket_alias is None:
        raise ValueError("nothing to compute")
    # drop_vec: consumers that only need the stats skip paying the
    # vector's return trip over the Arrow socket (guide §4.1: control
    # how many columns cross the boundary)
    fields = [f for f in df.schema.fields
              if not (drop_vec and f.name == vec_col)]
    pass_names = [f.name for f in fields]
    extra = ([f"`{norm_alias}` double"] if norm_alias else []) \
        + ([f"`{bucket_alias}` bigint"] if bucket_alias else [])
    out_ddl = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in fields] + extra)
    all_bits = (1 << n_planes) - 1

    def kernel(it):
        import numpy as np
        import pyarrow as pa

        wcache: dict[int, "np.ndarray"] = {}

        def planes(d: int) -> "np.ndarray":
            W = wcache.get(d)
            if W is None:
                p = np.arange(n_planes, dtype=np.int64)[:, None]
                pos = np.arange(1, d + 1, dtype=np.int64)[None, :]
                W = ((p * 73856093 + pos * 19349663) % 1000003) \
                    / 1000003.0 - 0.5
                wcache[d] = W
            return W

        for batch in it:
            names = batch.schema.names
            vec = batch.column(names.index(vec_col))
            n = batch.num_rows
            norms = np.full(n, np.nan, dtype=np.float64)
            norm_ok = np.zeros(n, dtype=bool)
            buckets = np.zeros(n, dtype=np.int64)
            offsets = vec.offsets.to_numpy(zero_copy_only=False)
            flat = vec.values.to_numpy(zero_copy_only=False).astype(
                np.float64)
            lens = np.diff(offsets)
            valid = np.asarray(vec.is_valid())
            if vec.values.null_count:
                # a null ELEMENT poisons every fold -> norm NULL, bucket 0
                vv = np.asarray(vec.values.is_valid())
                for r in np.where(valid)[0]:
                    if not vv[offsets[r]:offsets[r + 1]].all():
                        valid[r] = False
            for d in np.unique(lens[valid]):
                d = int(d)
                rows = np.where(valid & (lens == d))[0]
                if d == 0:
                    norms[rows] = 0.0
                    norm_ok[rows] = True
                    buckets[rows] = all_bits  # empty fold: 0.0 >= 0 per plane
                    continue
                idx = (offsets[rows][:, None] + np.arange(d)[None, :]).ravel()
                X = flat[idx].reshape(-1, d)
                if norm_alias:
                    u = _round_units(X * X).sum(axis=1)
                    if int(u.max(initial=0)) >= 2 ** 53:
                        raise ValueError("norm unit total >= 2^53")
                    norms[rows] = u.astype(np.float64) / 1.0e12
                    norm_ok[rows] = True
                if bucket_alias:
                    P = X[:, None, :] * planes(d)[None, :, :]
                    pu = _round_units(P).sum(axis=2)  # (R, n_planes)
                    bits = (pu >= 0).astype(np.int64)
                    buckets[rows] = (
                        bits * (1 << np.arange(n_planes, dtype=np.int64))
                    ).sum(axis=1)
            arrays = [batch.column(names.index(p)) for p in pass_names]
            outn = list(pass_names)
            if norm_alias:
                arrays.append(pa.array(norms, type=pa.float64(),
                                       mask=~norm_ok))
                outn.append(norm_alias)
            if bucket_alias:
                arrays.append(pa.array(buckets, type=pa.int64()))
                outn.append(bucket_alias)
            yield pa.RecordBatch.from_arrays(arrays, names=outn)

    return df.mapInArrow(kernel, out_ddl)


def label_centroid_ab_frame(df, cents, labels,
                            id_col: str = "vec_id",
                            label_col: str = "label",
                            vec_col: str = "embedding"):
    """One-pass centroid-silhouette inputs: for each vector emit
    (id, own_label, a2, b2) where a2 = exact squared distance to the
    OWN label's centroid and b2 = min over the OTHER labels' centroids
    (NULL when there is no other label) — replacing the N x d x |labels|
    explode/broadcast-join/decimal-aggregate of
    embedding_silhouette_by_label. ``cents`` is the (L, d) float64
    centroid matrix for ``labels`` (ascending); both come from the same
    bounded |labels| x d aggregate the old plan broadcast. Distance
    exactness is the PQ kernel contract (module docstring): identical
    IEEE (val - c)^2, _round_units, int64 sums < 2^53 asserted, and
    min-over-doubles == min-over-units. Null vectors/elements/labels
    raise (never in the fixtures)."""
    import numpy as np

    C = np.ascontiguousarray(cents, dtype=np.float64)
    L = np.asarray(labels)
    if C.shape[0] != len(L) or not (np.diff(L) > 0).all():
        raise ValueError("labels must be ascending and match cents rows")

    def kernel(it):
        import pyarrow as pa

        for batch in it:
            names = batch.schema.names
            lab_arr = batch.column(names.index(label_col))
            if lab_arr.null_count:
                raise ValueError("silhouette kernel: null label")
            labs_all = lab_arr.to_numpy(zero_copy_only=False)
            pos_in_batch = {}
            off = 0
            # _pq_iter_slabs yields per-length slabs of the SAME batch in
            # row order per group; recover each slab's row indices by
            # re-deriving them the same way
            vec = batch.column(names.index(vec_col))
            offsets = vec.offsets.to_numpy(zero_copy_only=False)
            lens = np.diff(offsets)
            for ids, X in _pq_iter_slabs(batch, id_col, vec_col):
                d = X.shape[1]
                rows = np.where(lens == d)[0]
                start = pos_in_batch.get(d, 0)
                rows = rows[start:start + len(ids)]
                pos_in_batch[d] = start + len(ids)
                labs = labs_all[rows]
                own = np.searchsorted(L, labs)
                if (own >= len(L)).any() or (L[own] != labs).any():
                    raise ValueError("silhouette kernel: label without "
                                     "a centroid")
                U = _pq_unit_tensor(X, C, C.shape[1])[:, :, 0]  # (R, L)
                if int(U.max(initial=0)) >= _PQ_SUM_CAP:
                    raise ValueError("silhouette kernel: unit total >= 2^53")
                r = np.arange(len(ids))
                a2 = U[r, own].astype(np.float64) / 1.0e12
                if len(L) > 1:
                    Um = U.astype(np.float64)
                    Um[r, own] = np.inf
                    b2 = Um.min(axis=1) / 1.0e12
                    b_ok = np.ones(len(ids), dtype=bool)
                else:
                    b2 = np.full(len(ids), np.nan)
                    b_ok = np.zeros(len(ids), dtype=bool)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ids), pa.array(labs),
                     pa.array(a2), pa.array(b2, mask=~b_ok)],
                    names=[id_col, "own_label", "a2", "b2"])

    dt = dict(df.dtypes)
    return df.select(id_col, label_col, vec_col).mapInArrow(
        kernel, f"`{id_col}` {dt[id_col]}, own_label {dt[label_col]}, "
                "a2 double, b2 double")


def ols_moment_partials(df, group_col: str, x_col: str, y_col: str):
    """Per-task OLS moment partials in exact 1e-12 units: one row per
    (task, group) with (group, n, ux, uy, uxy, uxx, uyy) — the five
    DECIMAL moment sums of part_price_elasticity's fold, vectorized.

    The inputs are the RAW JVM ln doubles — the libm-sensitive ln stays
    in the JVM, so the kernel sees the exact same doubles the old plan
    rounded. The kernel applies the ROUND(v, 12) contract itself:
    Spark's ROUND on a double is BigDecimal.valueOf(v).setScale(12,
    HALF_UP).toDouble, which is exactly ``_round_units(v)`` (units) and
    ``units/1e12`` (the correctly rounded double both engines then
    multiply). CAST(x AS DECIMAL(20,12)) of that 12-decimal double < 4096
    recovers the same units; x*y / x*x / y*y are correctly rounded
    doubles of identical operands, then the same CAST-to-units contract. Partials accumulate as Python ints (exact
    at any task size; per-batch int64 sums stay < 2^53 for |x| <= 4096
    at Arrow's 10k-row default batch, asserted); the cross-task fold
    sums DECIMAL(38,0) units in Spark and units_as_double recovers the
    exact CAST(decimal-sum AS DOUBLE). Null group keys group together
    (SQL GROUP BY semantics); null x/y cannot occur behind the > 0
    filters (asserted loudly)."""
    import pyarrow  # noqa: F401 — fail fast at plan time, not in tasks

    def kernel(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        acc: dict = {}

        def bump(key, n, sums):
            cur = acc.get(key)
            if cur is None:
                acc[key] = [n] + [int(s) for s in sums]
            else:
                cur[0] += n
                for i, s in enumerate(sums):
                    cur[i + 1] += int(s)

        for batch in it:
            names = batch.schema.names
            g = batch.column(names.index(group_col))
            x_arr = batch.column(names.index(x_col))
            y_arr = batch.column(names.index(y_col))
            if x_arr.null_count or y_arr.null_count:
                raise ValueError("ols kernel: null x/y behind the filter")
            ux = _round_units(x_arr.to_numpy(zero_copy_only=False))
            uy = _round_units(y_arr.to_numpy(zero_copy_only=False))
            x = ux.astype(np.float64) / 1.0e12  # == ROUND(raw, 12)
            y = uy.astype(np.float64) / 1.0e12
            U = [ux, uy, _round_units(x * y),
                 _round_units(x * x), _round_units(y * y)]
            if max(int(np.abs(u).max(initial=0)) for u in U) \
                    * batch.num_rows >= 2 ** 63 - 1:
                raise ValueError("ols kernel: per-batch unit sum could "
                                 "overflow int64")
            enc = pc.dictionary_encode(g)
            idx = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
            keys = enc.dictionary.to_pylist()
            for k in range(-1, len(keys)):
                m = idx == k
                cnt = int(m.sum())
                if not cnt:
                    continue
                key = None if k == -1 else keys[k]
                bump(key, cnt, [u[m].sum() for u in U])
        if acc:
            import pyarrow as pa
            from decimal import Decimal
            ks = list(acc)
            cols = [pa.array(ks)] + [
                pa.array([acc[k][0] for k in ks], type=pa.int64())] + [
                pa.array([Decimal(acc[k][i]) for k in ks],
                         type=pa.decimal128(38, 0)) for i in range(1, 6)]
            yield pa.RecordBatch.from_arrays(
                cols, names=[group_col, "n", "ux", "uy", "uxy",
                             "uxx", "uyy"])

    gtype = dict(df.dtypes)[group_col]
    return df.select(group_col, x_col, y_col).mapInArrow(
        kernel, f"`{group_col}` {gtype}, n bigint, ux decimal(38,0), "
                "uy decimal(38,0), uxy decimal(38,0), uxx decimal(38,0), "
                "uyy decimal(38,0)")


def grouped_dsum_partials(df, group_cols, val_cols, scale: int = 6):
    """Per-task grouped decimal-sum partials: one row per (task, group
    tuple) carrying n = COUNT(*) and one exact 10^-scale unit total per
    value column — the vectorized map side of the ``dsum`` contract
    (CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)) for scan-heavy
    fact aggregates whose per-row cost was one BigDecimal per cast.

    The value columns must be the JVM-projected doubles (products like
    e*(1-d) computed in codegen — correctly rounded doubles NumPy
    reproduces bit-identically is NOT needed here because the columns
    arrive already evaluated). CAST(v AS DECIMAL(p,scale)) ==
    ``_round_units(v, scale)`` (tie-band exact); per-batch int64 sums
    are bounded (asserted) and fold into Python ints per task; the
    cross-task fold sums DECIMAL(38,0) units in Spark and
    ``units_as_double(col, scale)`` recovers the exact
    CAST(decimal-sum AS DOUBLE). NULL group keys group together; NULL
    values are skipped by SUM but still counted by COUNT(*), exactly
    the SQL semantics."""
    import pyarrow  # noqa: F401 — fail fast at plan time, not in tasks

    group_cols = list(group_cols)
    val_cols = list(val_cols)

    def kernel(it):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        acc: dict = {}
        for batch in it:
            names = batch.schema.names
            n_rows = batch.num_rows
            # composite group index: dictionary-encode each key column
            # and mix (small alphabets — the group-by keys of a report)
            idx = np.zeros(n_rows, dtype=np.int64)
            dicts = []
            for gc in group_cols:
                enc = pc.dictionary_encode(batch.column(names.index(gc)))
                ks = enc.dictionary.to_pylist()
                gi = enc.indices.fill_null(len(ks)).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                idx = idx * (len(ks) + 1) + gi
                dicts.append(ks + [None])
            vals = []
            nn_masks = []
            for vc in val_cols:
                arr = batch.column(names.index(vc))
                v = arr.to_numpy(zero_copy_only=False)
                u = np.zeros(n_rows, dtype=np.int64)
                ok = ~np.asarray(arr.is_null()) if arr.null_count \
                    else np.ones(n_rows, dtype=bool)
                u[ok] = _round_units(v[ok], scale)
                if int(np.abs(u).max(initial=0)) * n_rows >= 2 ** 63 - 1:
                    raise ValueError("dsum kernel: per-batch unit sum "
                                     "could overflow int64")
                vals.append(u)
                nn_masks.append(ok)
            for code in np.unique(idx):
                m = idx == code
                key = []
                c = int(code)
                for ks in reversed(dicts):
                    key.append(ks[c % len(ks)])
                    c //= len(ks)
                key = tuple(reversed(key))
                cur = acc.get(key)
                sums = [int(u[m].sum()) for u in vals]
                # per-column non-null count: an ALL-NULL group's SUM is
                # NULL, not 0 — zero-add only mirrors SUM's null skip
                # while at least one value exists
                nns = [int(ok[m].sum()) for ok in nn_masks]
                if cur is None:
                    acc[key] = [int(m.sum())] + sums + nns
                else:
                    cur[0] += int(m.sum())
                    for i, s in enumerate(sums):
                        cur[i + 1] += s
                    for i, c2 in enumerate(nns):
                        cur[1 + len(vals) + i] += c2
        if acc:
            from decimal import Decimal

            import pyarrow as pa
            ks = list(acc)
            cols = [pa.array([k[i] for k in ks])
                    for i in range(len(group_cols))]
            cols.append(pa.array([acc[k][0] for k in ks],
                                 type=pa.int64()))
            nv = len(val_cols)
            for i in range(nv):
                cols.append(pa.array(
                    [None if acc[k][1 + nv + i] == 0
                     else Decimal(acc[k][i + 1]) for k in ks],
                    type=pa.decimal128(38, 0)))
            yield pa.RecordBatch.from_arrays(
                cols, names=group_cols + ["n"]
                + [f"u_{c}" for c in val_cols])

    dt = dict(df.dtypes)
    ddl = ", ".join([f"`{g}` {dt[g]}" for g in group_cols]
                    + ["n bigint"]
                    + [f"`u_{c}` decimal(38,0)" for c in val_cols])
    return df.select(*group_cols, *val_cols).mapInArrow(kernel, ddl)
