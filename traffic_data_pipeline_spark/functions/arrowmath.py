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


def _units_exact(p: float) -> int:
    """Exact HALF_UP units of one product — the scalar tie-band path.
    ``Decimal(repr(p))`` mirrors ``BigDecimal.valueOf(p)``: both parse
    the shortest decimal string that round-trips to ``p``."""
    return int(Decimal(repr(p)).scaleb(_UNIT_SCALE)
               .quantize(Decimal(1), rounding=ROUND_HALF_UP))


def _round_units(P):
    """Vectorized HALF_UP(P * 1e12) with the exact tie-band fixup.
    Returns int64 units, elementwise equal to Spark's
    CAST(P AS DECIMAL(30,12)) in 1e-12 units."""
    import numpy as np

    F = P * 1e12
    A = np.abs(F)
    R = np.floor(A + 0.5)
    frac = A - np.floor(A)
    U = (np.sign(F) * R).astype(np.int64)
    sus = np.abs(frac - 0.5) < _TIE_BAND
    if sus.any():
        flatP = P[sus]
        U[sus] = [_units_exact(float(p)) for p in flatP.ravel()]
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
                for s in range(0, E.shape[0], SLAB):
                    Es = E[s:s + SLAB]
                    P = Es[:, :, None] * Es[:, None, :]
                    acc += _round_units(P).sum(axis=0)
    if accs:
        dmax = max(accs)
        total = np.zeros((dmax, dmax), dtype=np.int64)
        for d, acc in accs.items():
            total[:d, :d] += acc
        iu, ju = np.triu_indices(dmax)
        yield pa.RecordBatch.from_arrays(
            [pa.array((iu + 1).astype(np.int64)),
             pa.array((ju + 1).astype(np.int64)),
             pa.array(total[iu, ju])],
            names=["i", "j", "u"])
    else:  # empty task: emit nothing (the groupBy fold tolerates it)
        return
