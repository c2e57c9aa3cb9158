"""Mass-matrix operators.

The reference threads ``inv_mass`` (None | (D,) diag | (D,D) dense | list of
blocks) through every integrator branch with repeated isinstance dispatch
(reference: hamiltorch/samplers.py:283-296, 800-814) and re-inverts it once in
the driver for momentum sampling (reference: hamiltorch/samplers.py:941-952).

Here the four kinetic-energy forms become one operator protocol with three
methods, each a pure jittable function:

* ``sample(key)``        -> momentum ~ N(0, M)
* ``velocity(p)``        -> M^{-1} p          (the leapfrog drift direction)
* ``kinetic(p)``         -> 0.5 p^T M^{-1} p

Operators are registered pytrees so they can be closed over by jit, carried
through scans, vmapped over a chain axis, and sharded over a device mesh.
Dense factors (Cholesky of M) are computed once at construction on the host
side of jit, never inside the sampling loop.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class IdentityMass:
    """M = I. ``dim`` is static (shapes must be trace-time constants)."""

    dim: int = dataclasses.field(metadata=dict(static=True))

    def sample(self, key, dtype=jnp.float32):
        return jax.random.normal(key, (self.dim,), dtype)

    def velocity(self, p):
        return p

    def kinetic(self, p):
        return 0.5 * jnp.dot(p, p)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiagMass:
    """Diagonal mass given by its *inverse* diagonal (covariance scale).

    Mirrors the reference convention of configuring ``inv_mass`` and deriving
    the mass as its reciprocal for momentum draws (reference:
    hamiltorch/samplers.py:951-952, 200-201).
    """

    inv_diag: jnp.ndarray

    def sample(self, key, dtype=jnp.float32):
        z = jax.random.normal(key, self.inv_diag.shape, dtype)
        return z * jax.lax.rsqrt(self.inv_diag.astype(dtype))

    def velocity(self, p):
        return self.inv_diag * p

    def kinetic(self, p):
        return 0.5 * jnp.dot(p, self.inv_diag * p)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseMass:
    """Dense mass; holds inv_mass plus a precomputed Cholesky factor of M.

    ``chol_mass`` satisfies M = chol_mass @ chol_mass.T so momentum draws are
    a single triangular matmul (MXU-friendly) instead of a per-draw
    MultivariateNormal setup (reference: hamiltorch/samplers.py:198-199).
    """

    inv_mass: jnp.ndarray
    chol_mass: jnp.ndarray

    @staticmethod
    def from_inv_mass(inv_mass: jnp.ndarray) -> "DenseMass":
        mass = jnp.linalg.inv(inv_mass)
        # Symmetrize before factoring to absorb inversion round-off.
        mass = 0.5 * (mass + mass.T)
        return DenseMass(inv_mass=inv_mass, chol_mass=jnp.linalg.cholesky(mass))

    def sample(self, key, dtype=jnp.float32):
        z = jax.random.normal(key, (self.inv_mass.shape[0],), dtype)
        return self.chol_mass.astype(dtype) @ z

    def velocity(self, p):
        return self.inv_mass @ p

    def kinetic(self, p):
        return 0.5 * jnp.dot(p, self.inv_mass @ p)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockDiagMass:
    """Block-diagonal mass as a *batched* dense operator.

    The reference loops over a Python list of blocks with per-block slicing
    inside the hot loop (reference: hamiltorch/samplers.py:188-197, 287-292,
    803-809).  TPU-first design: pad every block to the largest block size K,
    stack to (B, K, K), and do one batched matmul — XLA maps this to a single
    MXU einsum instead of B serial small matmuls.  Padding uses an identity
    tail so the padded operator is still SPD; padded momentum lanes are
    masked out of samples/velocity/kinetic.
    """

    inv_blocks: jnp.ndarray  # (B, K, K) padded inverse-mass blocks
    chol_blocks: jnp.ndarray  # (B, K, K) padded Cholesky factors of mass
    mask: jnp.ndarray  # (B, K) 1.0 for real lanes, 0.0 for padding
    lane_idx: jnp.ndarray  # (D,) int32 positions of real lanes in (B*K,)
    dim: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def from_inv_blocks(inv_blocks: Sequence[jnp.ndarray]) -> "BlockDiagMass":
        import numpy as np

        sizes = [int(b.shape[0]) for b in inv_blocks]
        kmax = max(sizes)
        padded_inv, padded_chol, masks = [], [], []
        lane_idx = []
        for bi, b in enumerate(inv_blocks):
            k = b.shape[0]
            eye_pad = jnp.eye(kmax, dtype=b.dtype)
            pb = eye_pad.at[:k, :k].set(b)
            mass = jnp.linalg.inv(pb)
            mass = 0.5 * (mass + mass.T)
            padded_inv.append(pb)
            padded_chol.append(jnp.linalg.cholesky(mass))
            masks.append((jnp.arange(kmax) < k).astype(b.dtype))
            lane_idx.append(np.arange(k) + bi * kmax)
        return BlockDiagMass(
            inv_blocks=jnp.stack(padded_inv),
            chol_blocks=jnp.stack(padded_chol),
            mask=jnp.stack(masks),
            lane_idx=jnp.asarray(np.concatenate(lane_idx), dtype=jnp.int32),
            dim=sum(sizes),
        )

    def _scatter(self, blocked: jnp.ndarray) -> jnp.ndarray:
        """(B, K) padded lanes -> flat (D,) via static lane indices."""
        return blocked.reshape(-1)[self.lane_idx]

    def _gather(self, p: jnp.ndarray) -> jnp.ndarray:
        """Flat (D,) -> (B, K) padded lanes (zeros in padding)."""
        flat = jnp.zeros(self.mask.size, p.dtype).at[self.lane_idx].set(p)
        return flat.reshape(self.mask.shape)

    def sample(self, key, dtype=jnp.float32):
        b, k = self.mask.shape
        z = jax.random.normal(key, (b, k), dtype) * self.mask.astype(dtype)
        p = jnp.einsum("bij,bj->bi", self.chol_blocks.astype(dtype), z)
        return self._scatter(p * self.mask.astype(dtype))

    def velocity(self, p):
        pb = self._gather(p)
        v = jnp.einsum("bij,bj->bi", self.inv_blocks, pb)
        return self._scatter(v * self.mask)

    def kinetic(self, p):
        pb = self._gather(p)
        v = jnp.einsum("bij,bj->bi", self.inv_blocks, pb)
        return 0.5 * jnp.sum(pb * v)


MassOperator = IdentityMass | DiagMass | DenseMass | BlockDiagMass


def tree_ravel(tree) -> jnp.ndarray:
    """Concatenate a pytree's leaves into one flat vector (C order).

    Unlike ``jax.flatten_util.ravel_pytree`` this returns no unravel
    closure, so it can live inside jitted code without capturing
    unhashable callables.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    if len(leaves) == 1 and leaves[0].ndim == 1:
        return leaves[0]
    return jnp.concatenate([l.reshape(-1) for l in leaves])


def tree_unravel_like(template, flat: jnp.ndarray):
    """Split a flat vector back into a pytree shaped like ``template``."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    parts, off = [], 0
    for l in leaves:
        n = l.size
        parts.append(flat[off : off + n].reshape(l.shape))
        off += n
    return jax.tree_util.tree_unflatten(treedef, parts)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TreeMass:
    """Mass operator over *pytree* phase space.

    The pytree-native chain-state path (run_hmc over parameter pytrees)
    exists to avoid the flat-vector layout tax: on the flagship BNN ~24%
    of each leapfrog step was slice/bitcast/copy traffic carving layer
    views out of a flat theta (docs/BENCHMARKS.md "Where the time goes").
    With tree state the integrator updates each leaf in place-shape and
    the potential's backward pass emits per-leaf gradients — no
    concatenate/slice round-trip inside the hot loop.

    Bit-compatibility with the flat path is preserved where it is cheap
    (once per draw, not per leapfrog step): momentum is drawn as ONE flat
    normal vector and split into leaves, and kinetic energies reduce over
    the concatenated flat vector, so (sample, velocity, kinetic) agree
    bitwise with the equivalent flat-vector operator.

    ``inv_diag_tree`` holds the per-leaf unraveled inverse-mass diagonal
    for diagonal inner operators (leafwise drift without raveling); dense
    and block operators drift through a ravel/unravel round-trip, which is
    negligible next to their O(D^2) matvec.
    """

    inner: MassOperator
    inv_diag_tree: object  # pytree of per-leaf inv diag, or None
    treedef: object = dataclasses.field(metadata=dict(static=True))
    shapes: tuple = dataclasses.field(metadata=dict(static=True))

    def _unravel(self, flat: jnp.ndarray):
        parts, off = [], 0
        for shape in self.shapes:
            n = 1
            for s in shape:
                n *= s
            parts.append(flat[off : off + n].reshape(shape))
            off += n
        return jax.tree_util.tree_unflatten(self.treedef, parts)

    def sample(self, key, dtype=jnp.float32):
        return self._unravel(self.inner.sample(key, dtype))

    def velocity(self, p):
        if self.inv_diag_tree is not None:
            return jax.tree_util.tree_map(lambda d, x: d * x, self.inv_diag_tree, p)
        if isinstance(self.inner, IdentityMass):
            return p
        return self._unravel(self.inner.velocity(tree_ravel(p)))

    def kinetic(self, p):
        return self.inner.kinetic(tree_ravel(p))

    def kinetic_leafwise(self, p):
        """0.5 pᵀM⁻¹p reduced PER LEAF — no flat concatenation.

        ``kinetic`` ravels the momentum tree into one (D,) vector, which is
        fine once per transition (and keeps the reduction bitwise identical
        to the flat path) but would reintroduce the flat-layout copy tax
        inside per-leaf-step energy evaluations (NUTS computes H at every
        leaf).  This variant sums per-leaf reductions instead: float-level
        (not bitwise) equivalent to ``kinetic``.  Dense/block inner
        operators need the flat layout and fall back to ``kinetic``.
        """
        p_leaves = jax.tree_util.tree_leaves(p)
        if self.inv_diag_tree is not None:
            d_leaves = jax.tree_util.tree_leaves(self.inv_diag_tree)
            parts = [
                jnp.sum(pl * pl * dl) for pl, dl in zip(p_leaves, d_leaves)
            ]
        elif isinstance(self.inner, IdentityMass):
            parts = [jnp.sum(pl * pl) for pl in p_leaves]
        else:
            return self.kinetic(p)
        return 0.5 * sum(parts)


def diag_tree_mass_view(metric_flat, treedef, shapes) -> TreeMass:
    """TreeMass view of a FLAT inverse-mass diagonal.

    The windowed-warmup bridge: adaptation carries the metric as one flat
    (D,) diagonal; the per-draw transition rebuilds the per-leaf view from
    it (once per draw — the hot loop then drifts leafwise)."""
    parts, off = [], 0
    for shape in shapes:
        n = 1
        for s in shape:
            n *= s
        parts.append(metric_flat[off : off + n].reshape(shape))
        off += n
    return TreeMass(
        inner=DiagMass(inv_diag=metric_flat),
        inv_diag_tree=jax.tree_util.tree_unflatten(treedef, parts),
        treedef=treedef,
        shapes=shapes,
    )


def make_diag_mass_tree(inv_mass, params_template, what: str,
                        dense_requested: bool = False) -> TreeMass:
    """Validated TreeMass for a pytree sampler entry (DIAGONAL metrics
    only) — the shared contract of every pytree entry point: per-leaf or
    flat diagonal ``inv_mass`` (or None); dense/block metrics and dense
    windowed warmup stay flat-path-only and raise."""
    if dense_requested:
        raise ValueError(
            "adapt_mass='dense' is not supported with a pytree chain state "
            "— the dense metric operates on the flat layout; pass a flat "
            "(D,) theta0, or use diagonal adaptation."
        )
    mass = make_mass_tree(inv_mass, params_template)
    if isinstance(mass.inner, (DenseMass, BlockDiagMass)):
        raise ValueError(
            f"pytree {what} supports diagonal metrics only — pass "
            "inv_mass=None, a flat (D,) diagonal, or a per-leaf pytree of "
            "diagonals (dense/block inv_mass needs the flat (D,) theta0 "
            "path)."
        )
    return mass


def make_mass_tree(inv_mass, params_template) -> TreeMass:
    """Build a TreeMass for a parameter pytree.

    ``inv_mass`` may be None (identity), a flat (D,) diagonal, a pytree of
    per-leaf diagonals matching ``params_template``, a dense (D, D)
    matrix, or a list of blocks — the same convention as ``make_mass``
    with the pytree-diagonal extension.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params_template)
    shapes = tuple(tuple(l.shape) for l in leaves)
    dim = sum(l.size for l in leaves)

    if inv_mass is not None and not isinstance(inv_mass, (list, tuple)):
        maybe_tree = jax.tree_util.tree_structure(inv_mass)
        # structure match alone disambiguates: a flat (D,) array has LEAF
        # structure, which only equals the template's when the template is
        # itself a bare leaf — and then the per-leaf and flat readings
        # coincide, so single-leaf templates are fine here too
        if maybe_tree == treedef:
            flat = tree_ravel(inv_mass)
            inner = make_mass(flat, dim)
            return TreeMass(
                inner=inner, inv_diag_tree=inv_mass, treedef=treedef, shapes=shapes
            )

    if inv_mass is None or isinstance(inv_mass, (list, tuple)):
        inner = make_mass(inv_mass, dim)
    else:
        inner = make_mass(jnp.asarray(inv_mass), dim)
    inv_diag_tree = None
    if isinstance(inner, DiagMass):
        parts, off = [], 0
        for l in leaves:
            parts.append(inner.inv_diag[off : off + l.size].reshape(l.shape))
            off += l.size
        inv_diag_tree = jax.tree_util.tree_unflatten(treedef, parts)
    return TreeMass(
        inner=inner, inv_diag_tree=inv_diag_tree, treedef=treedef, shapes=shapes
    )


def make_mass(inv_mass, dim: int) -> MassOperator:
    """Build an operator from the reference's ``inv_mass`` convention.

    None -> identity; (D,) -> diagonal; (D,D) -> dense; list/tuple of square
    arrays -> block-diagonal (reference: hamiltorch/samplers.py:941-952).
    """
    if inv_mass is None:
        return IdentityMass(dim=dim)
    if isinstance(inv_mass, (list, tuple)):
        op = BlockDiagMass.from_inv_blocks([jnp.asarray(b) for b in inv_mass])
        if op.dim != dim:
            raise ValueError(f"inv_mass blocks cover {op.dim} dims, params have {dim}")
        return op
    inv_mass = jnp.asarray(inv_mass)
    if inv_mass.shape[0] != dim:
        raise ValueError(f"inv_mass has dim {inv_mass.shape[0]}, params have {dim}")
    if inv_mass.ndim == 1:
        return DiagMass(inv_diag=inv_mass)
    if inv_mass.ndim == 2:
        return DenseMass.from_inv_mass(inv_mass)
    raise ValueError(f"inv_mass must be None, 1-d, 2-d, or a list of blocks; got ndim={inv_mass.ndim}")
