r"""TPU-native scrambled Sobol sequence generator.

The reference relies on `torch.quasirandom.SobolEngine` (C++,
`botorch/utils/sampling.py:66-139`, `botorch/sampling/qmc.py:27-173`). Here
the generator is re-built natively: Joe & Kuo primitive-polynomial /
initial-direction-number *data* is loaded from scipy's bundled table
(`scipy/stats/_sobol_direction_numbers.npz`, 21201 dims — the same dataset
torch uses), the full 32-bit direction-number matrix is computed once on the
host via the standard Sobol recurrence, and point generation itself is pure
JAX `uint32` bit manipulation (Gray-code XOR folding) that runs on the TPU
VPU and is `jit`/`vmap`-safe.

Scrambling is linear-matrix-scramble (LMS) + random digital shift
(Matousek), matching the `scramble=True` behavior of scipy/torch engines.

Layout conventions:
  * integers carry the first 32 binary digits of the point, most significant
    digit in bit 31;
  * floats are produced as `((r >> 8) + 0.5) * 2^-24`, strictly inside
    (0, 1) — important because downstream inverse-CDF Gaussian transforms
    must never see 0 or 1.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

MAXDIM = 21201
_NBITS = 32


def _direction_data():
    import scipy.stats

    path = os.path.join(
        os.path.dirname(scipy.stats.__file__), "_sobol_direction_numbers.npz"
    )
    data = np.load(path)
    return data["poly"], data["vinit"]


@functools.lru_cache(maxsize=8)
def _direction_numbers(dimension: int) -> np.ndarray:
    """Full (dimension, 32) uint32 direction-number matrix `V[j, k] = v_{k+1}
    * 2^32` via the Joe & Kuo recurrence
    `m_k = (m_{k-s} << s) ^ m_{k-s} ^ XOR_i a_i (m_{k-i} << i)`.
    """
    if not 1 <= dimension <= MAXDIM:
        raise ValueError(f"dimension must be in [1, {MAXDIM}], got {dimension}")
    poly, vinit = _direction_data()
    V = np.zeros((dimension, _NBITS), dtype=np.uint64)
    V[0] = 1  # first dimension: van der Corput (all m_k = 1)
    for j in range(1, dimension):
        p = int(poly[j])
        s = p.bit_length() - 1
        # polynomial coefficients a_1..a_{s-1} (between leading and trailing 1)
        a = [(p >> (s - 1 - i)) & 1 for i in range(1, s)]
        m = [int(v) for v in vinit[j, :s]]
        for k in range(s, _NBITS):
            new = (m[k - s] << s) ^ m[k - s]
            for i in range(1, s):
                if a[i - 1]:
                    new ^= m[k - i] << i
            m.append(new)
        V[j] = np.asarray(m, dtype=np.uint64)
    # v_k = m_k / 2^k as a 32-bit fixed-point fraction.
    shifts = (_NBITS - 1 - np.arange(_NBITS)).astype(np.uint64)
    return (V << shifts[None, :]).astype(np.uint32)


def _scramble_directions(
    V: np.ndarray, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray]:
    """Apply a per-dimension random linear matrix scramble (lower-triangular,
    unit diagonal, GF(2)) to the direction numbers and draw a random digital
    shift. Host-side, one-time cost."""
    d = V.shape[0]
    digits = (V[:, :, None] >> (31 - np.arange(_NBITS))[None, None, :]) & 1
    # L: (d, 32, 32) lower-triangular random bits with unit diagonal.
    L = np.tril(rng.integers(0, 2, size=(d, _NBITS, _NBITS), dtype=np.uint32), -1)
    L |= np.eye(_NBITS, dtype=np.uint32)[None]
    new_digits = np.einsum("jrc,jkc->jkr", L, digits) & 1
    place = (31 - np.arange(_NBITS, dtype=np.uint64))[None, None, :]
    sv = (new_digits.astype(np.uint64) << place).sum(axis=-1).astype(np.uint32)
    shift = rng.integers(0, 1 << 32, size=(d,), dtype=np.uint64).astype(np.uint32)
    return sv, shift


def sobol_table(
    dimension: int, scramble: bool = True, seed: int | None = None
) -> tuple[Array, Array]:
    """Build the (direction-numbers, digital-shift) device tables for a
    `dimension`-dim Sobol engine. These are the only state of the generator;
    pass them to :func:`draw_sobol_bits` / :func:`draw_sobol`.
    """
    V = _direction_numbers(dimension)
    if scramble:
        rng = np.random.default_rng(0 if seed is None else seed)
        sv, shift = _scramble_directions(V, rng)
    else:
        sv, shift = V, np.zeros((dimension,), np.uint32)
    return jnp.asarray(sv), jnp.asarray(shift)


@functools.partial(jax.jit, static_argnums=(2,))
def draw_sobol_bits(sv: Array, shift: Array, n: int, skip=0) -> Array:
    """Draw `n` Sobol points as raw uint32 integers, shape `(n, d)`.

    Pure JAX: Gray-code indexing + XOR fold over the 32 direction numbers.
    `skip` may be a traced value; `n` is static.
    """
    idx = jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(skip)
    gray = idx ^ (idx >> 1)
    # (n, 32) {0,1} masks of which direction numbers participate.
    bits = (gray[:, None] >> jnp.arange(_NBITS, dtype=jnp.uint32)[None, :]) & 1
    masks = jnp.where(bits.astype(bool), jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    # XOR-fold (n, d, 32) -> (n, d) via log2(32)=5 halving steps (VPU-friendly).
    acc = masks[:, None, :] & sv[None, :, :]
    width = _NBITS
    while width > 1:
        width //= 2
        acc = acc[..., :width] ^ acc[..., width:]
    return acc[..., 0] ^ shift[None, :]


def bits_to_unit(bits: Array, dtype=jnp.float32) -> Array:
    """Map uint32 Sobol integers to floats strictly inside (0, 1)."""
    return ((bits >> 8).astype(dtype) + 0.5) * (2.0**-24)


def draw_sobol(sv: Array, shift: Array, n: int, skip=0, dtype=jnp.float32) -> Array:
    """Draw `n` points of the scrambled Sobol sequence in `(0, 1)^d`."""
    return bits_to_unit(draw_sobol_bits(sv, shift, n, skip), dtype=dtype)


def draw_sobol_samples(
    bounds: Array, n: int, q: int, seed: int | None = None, batch_shape=()
) -> Array:
    """Quasi-MC box samples, reference `utils/sampling.py:66-107` semantics.

    Returns a `batch_shape x n x q x d` array of Sobol points scaled to the
    box given by `bounds` (2 x d). Each (batch, n) slice uses one scrambled
    engine over `q * d` dims so q-batches are jointly low-discrepancy.
    """
    d = bounds.shape[-1]
    batch = int(np.prod(batch_shape)) if batch_shape else 1
    sv, shift = sobol_table(q * d, scramble=True, seed=seed)
    pts = draw_sobol(sv, shift, n * batch)  # (n*batch, q*d)
    pts = pts.reshape(batch, n, q, d) if batch_shape else pts.reshape(n, q, d)
    if batch_shape:
        pts = pts.reshape(*batch_shape, n, q, d)
    lo, hi = bounds[0], bounds[1]
    return lo + (hi - lo) * pts


def draw_sobol_normal_samples(
    d: int, n: int, seed: int | None = None, dtype=jnp.float32
) -> Array:
    """`n x d` standard-normal qMC samples via scrambled Sobol + inverse CDF
    (reference `utils/sampling.py:108-139`; transform as in
    `sampling/qmc.py:53-93` with `inv_transform=True`)."""
    sv, shift = sobol_table(d, scramble=True, seed=seed)
    u = draw_sobol(sv, shift, n, dtype=dtype)
    return jax.scipy.special.ndtri(u).astype(dtype)
