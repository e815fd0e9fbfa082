"""Frequent Directions — a mergeable MATRIX sketch for embedding tables.

Public algorithm: Liberty, "Simple and Deterministic Matrix Sketching"
(KDD 2013); Ghashami, Liberty, Phillips & Woodruff, "Frequent Directions:
Simple and Deterministic Matrix Sketching" (SIAM J. Comput. 2016), which
also proves MERGEABILITY — the property that makes it fit this library's
partial-build + tree-merge machinery exactly like HLL/KLL/theta.

The sketch maintains ≤ 2ℓ rows B approximating a tall n×d matrix A (the
embedding table): whenever the buffer fills, an SVD shrinks every squared
singular value by δ = σ²_ℓ and drops the zeroed rows. The certificate is
EXACT and carried in the sketch: ``shift`` = Σ δ over all compactions
(including merged-in sketches') satisfies

    0  ⪯  AᵀA − BᵀB  ⪯  shift · I      and      shift ≤ 2‖A‖_F² / ℓ

so covariance/Gram queries (principal directions of an embedding corpus,
low-rank energy, linear-regression sketching) come with a per-instance
spectral error bound, not just a probabilistic one. merge() concatenates
the other sketch's rows through the same compaction and ADDS the shifts —
associative up to the guarantee (row order may change B's bytes; the
bound always holds; ``n``/``frob``/``shift`` are exactly additive).

Scale: one sketch is O(ℓ·d) floats regardless of n — 10^9 embedding rows
reduce to per-partition partials of a few hundred KB that tree-merge like
every other sketch here.
"""

from __future__ import annotations

import struct

import numpy as np

from .base import FUNNEL_NONE, KIND_FD, Sketch, register_kind


@register_kind
class FrequentDirectionsSketch(Sketch):
    KIND = KIND_FD

    def __init__(self, ell: int = 32, d: int | None = None):
        if ell < 2:
            raise ValueError("ell must be >= 2")
        super().__init__(FUNNEL_NONE)
        self.ell = int(ell)
        self.d = int(d) if d is not None else None
        self._buf: np.ndarray | None = None  # (2*ell, d) float64
        self._filled = 0
        self._count = 0
        self.frob = 0.0  # cumulative ||A||_F^2 (exact)
        self.shift = 0.0  # cumulative shrinkage = certified spectral bound

    # -- contract -------------------------------------------------------------
    def _params_tuple(self) -> tuple:
        return (self.ell, self.d)

    def _params_bytes(self) -> bytes:
        return struct.pack(
            "<IIqdd", self.ell, self.d or 0, self._count, self.frob, self.shift
        )

    def _payload_bytes(self) -> bytes:
        if self._buf is None or self._filled == 0:
            return b""
        return np.ascontiguousarray(self._buf[: self._filled]).tobytes()

    # decode sanity caps: a corrupt params block must raise ValueError, not
    # attempt a multi-TB buffer allocation (ell/d are u32 in the wire format)
    _MAX_ELL = 1 << 20
    _MAX_D = 1 << 20

    @classmethod
    def _from_parts(
        cls, funnel: int, params: bytes, payload: bytes
    ) -> "FrequentDirectionsSketch":
        ell, d, count, frob, shift = struct.unpack_from("<IIqdd", params, 0)
        if not (2 <= ell <= cls._MAX_ELL) or d > cls._MAX_D or count < 0:
            raise ValueError(f"implausible fd params (ell={ell}, d={d}, n={count})")
        sk = cls(ell=ell, d=d or None)
        sk._count = count
        sk.frob = frob
        sk.shift = shift
        if payload and d:
            if len(payload) % (8 * d) or len(payload) // (8 * d) > 2 * ell:
                raise ValueError(
                    f"fd payload of {len(payload)} bytes does not fit "
                    f"<= {2 * ell} rows x {d} float64"
                )
            rows = np.frombuffer(payload, dtype=np.float64).reshape(-1, d).copy()
            sk._ensure_buf(d)
            sk._buf[: len(rows)] = rows
            sk._filled = len(rows)
        return sk

    def is_compatible(self, other: "Sketch") -> bool:
        # d binds lazily on first update; an empty sketch merges with any d
        return (
            type(other) is type(self)
            and other.ell == self.ell
            and (self.d is None or other.d is None or self.d == other.d)
        )

    # -- internals ------------------------------------------------------------
    def _ensure_buf(self, d: int) -> None:
        if self.d is None:
            self.d = int(d)
        elif self.d != d:
            from .base import IncompatibleSketchError

            raise IncompatibleSketchError(
                f"vector dimension {d} != sketch dimension {self.d}"
            )
        if self._buf is None:
            self._buf = np.zeros((2 * self.ell, self.d), dtype=np.float64)

    def _shrunk(self, rows: np.ndarray) -> np.ndarray:
        """SVD shrink of an arbitrary row buffer: squared singular values
        drop by δ = σ²_ℓ (the (ℓ+1)-th largest); rows at or below rank ℓ zero
        out. δ accumulates into the exact certificate. Works for any buffer
        height m ≥ ℓ: the removed Frobenius mass is ≥ ℓ·δ per compaction, so
        Σδ ≤ 2‖A‖²_F/ℓ holds exactly as with the classic 2ℓ buffer (Ghashami
        et al. §3 — the proof only uses the per-compaction mass argument).
        Returns the ≤ℓ (or ≤rank, if rank ≤ ℓ: exact reduction, δ=0) new rows."""
        try:
            _, s, vt = np.linalg.svd(rows, full_matrices=False)
        except np.linalg.LinAlgError:  # pragma: no cover — convergence corner
            _, s, vt = np.linalg.svd(
                rows + 1e-12 * np.random.default_rng(0).normal(size=rows.shape),
                full_matrices=False,
            )
        s2 = s * s
        if len(s2) <= self.ell:
            # rank-deficient input: s·Vᵀ preserves the Gram exactly, no shrink
            keep = int((s > 0).sum())
            return s[:keep, None] * vt[:keep]
        delta = float(s2[self.ell])
        s_new = np.sqrt(np.maximum(s2 - delta, 0.0))
        keep = int((s_new > 0).sum())
        self.shift += delta
        return s_new[:keep, None] * vt[:keep]

    def _compact(self) -> None:
        rows = self._shrunk(self._buf[: self._filled])
        self._buf[:] = 0.0
        self._buf[: len(rows)] = rows
        self._filled = len(rows)

    # -- updates ---------------------------------------------------------------
    def update(self, vectors) -> None:
        """Ingest a batch of row vectors: (m, d) array-like (or arrow
        list-of-float column). Rows containing NaN/Inf are dropped."""
        x = _to_matrix(vectors)
        if x is None or len(x) == 0:
            return
        finite = np.isfinite(x).all(axis=1)
        if not finite.all():
            x = x[finite]
        if len(x) == 0:
            return
        self._ensure_buf(x.shape[1])
        self._count += len(x)
        self.frob += float((x * x).sum())
        cap = 2 * self.ell
        if self._filled + len(x) > cap:
            # batched compaction: ONE SVD over [B; X] instead of ⌈m/ℓ⌉ small
            # ones — same shrinkage rule and certificate (see _shrunk), ~2×
            # fewer LAPACK calls on Arrow-batch-sized updates
            rows = self._shrunk(np.vstack([self._buf[: self._filled], x]))
            self._buf[:] = 0.0
            self._buf[: len(rows)] = rows
            self._filled = len(rows)
        else:
            self._buf[self._filled : self._filled + len(x)] = x
            self._filled += len(x)

    def merge(self, other: "FrequentDirectionsSketch") -> "FrequentDirectionsSketch":
        """Ghashami et al. mergeability: feed the other sketch's rows
        through the same compaction and add the certificates."""
        self._check_compatible(other)
        if other._filled and other._buf is not None:
            rows = other._buf[: other._filled]
            self._ensure_buf(rows.shape[1])
            cap = 2 * self.ell
            if self._filled + len(rows) > cap:
                merged = self._shrunk(np.vstack([self._buf[: self._filled], rows]))
                self._buf[:] = 0.0
                self._buf[: len(merged)] = merged
                self._filled = len(merged)
            else:
                self._buf[self._filled : self._filled + len(rows)] = rows
                self._filled += len(rows)
        self._count += other._count
        self.frob += other.frob
        self.shift += other.shift
        return self

    def fold_to(self, ell: int) -> "FrequentDirectionsSketch":
        """Fold to a smaller ℓ₂ ≤ ℓ: the retained rows feed through the
        ℓ₂ sketch's own shrink (exactly how a native ℓ₂ sketch absorbs a
        merge — Ghashami et al. mergeability), count/‖A‖²_F carry over
        EXACTLY, and the spectral certificate stays per-instance exact:
        the folded shift = this sketch's accumulated shift + the fold's
        own shrink δ, and 0 ⪯ AᵀA − BᵀB ⪯ shift·I still holds.  Completes
        the cross-parameter fold family (HLL/theta exact, KLL/t-digest
        bound-preserving) — mixed-ℓ FD tables merge via SQL
        ``sketch_fold(sketch, ell)``."""
        if not 2 <= ell <= self.ell:
            raise ValueError(f"can only fold to 2 <= ell <= {self.ell}, got {ell}")
        out = FrequentDirectionsSketch(ell=ell, d=self.d)
        if self._filled and self._buf is not None:
            rows = self._buf[: self._filled]
            out._ensure_buf(rows.shape[1])
            if len(rows) > 2 * ell:
                kept = out._shrunk(rows)  # fold δ accumulates into out.shift
            else:
                kept = rows.copy()
            out._buf[: len(kept)] = kept
            out._filled = len(kept)
        out._count = self._count
        out.frob = self.frob
        out.shift += self.shift
        return out

    # -- queries ----------------------------------------------------------------
    @property
    def size(self) -> int:
        return self._count

    def is_empty(self) -> bool:
        return self._count == 0

    def clear(self) -> None:
        self._buf = None
        self._filled = 0
        self._count = 0
        self.frob = 0.0
        self.shift = 0.0

    def rows(self) -> np.ndarray:
        """The ≤2ℓ sketch rows B (copy)."""
        if self._buf is None:
            return np.zeros((0, self.d or 0), dtype=np.float64)
        return self._buf[: self._filled].copy()

    def gram(self) -> np.ndarray:
        """BᵀB ≈ AᵀA, with 0 ⪯ AᵀA − BᵀB ⪯ spectral_bound()·I."""
        b = self.rows()
        d = self.d or 0
        return b.T @ b if len(b) else np.zeros((d, d), dtype=np.float64)

    def spectral_bound(self) -> float:
        """Certified upper bound on ‖AᵀA − BᵀB‖₂ for THIS instance (exact
        sum of compaction shrinkages — not just the worst-case 2‖A‖²_F/ℓ)."""
        return self.shift

    def singular_values(self) -> np.ndarray:
        b = self.rows()
        if not len(b):
            return np.zeros(0, dtype=np.float64)
        return np.linalg.svd(b, compute_uv=False)

    def top_directions(self, k: int) -> np.ndarray:
        """Top-k right singular vectors of the sketch (≈ principal
        directions of the embedding corpus), shape (k, d)."""
        b = self.rows()
        if not len(b):
            return np.zeros((0, self.d or 0), dtype=np.float64)
        _, _, vt = np.linalg.svd(b, full_matrices=False)
        return vt[:k]


def _to_matrix(vectors) -> np.ndarray | None:
    """Arrow list column / numpy / sequence-of-rows → (m, d) float64.

    Fast path for the hot case (non-null fixed-width list<float> batches from
    mapInArrow): flatten + reshape, no per-row Python objects."""
    try:
        import pyarrow as pa

        if isinstance(vectors, (pa.Array, pa.ChunkedArray)):
            if isinstance(vectors, pa.ChunkedArray):
                vectors = vectors.combine_chunks()
            if vectors.null_count:
                vectors = vectors.drop_null()
            if len(vectors) == 0:
                return None
            if pa.types.is_list(vectors.type) or pa.types.is_large_list(vectors.type):
                flat = vectors.flatten()
                if not flat.null_count:
                    offs = np.diff(vectors.offsets.to_numpy(zero_copy_only=False))
                    if len(offs) and (offs == offs[0]).all() and offs[0] > 0:
                        vals = flat.to_numpy(zero_copy_only=False)
                        return vals.astype(np.float64, copy=False).reshape(
                            -1, int(offs[0])
                        )
            lst = vectors.to_pylist()
            return np.asarray(lst, dtype=np.float64)
    except ImportError:  # pragma: no cover
        pass
    x = np.asarray(vectors, dtype=np.float64)
    if x.ndim == 1:
        x = x[None, :]
    return x
