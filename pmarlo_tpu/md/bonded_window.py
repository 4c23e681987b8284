"""Windowed one-hot bonded kernel: bonds/angles/torsions as MXU matmuls.

XLA evaluates the bonded terms (md/forces.py) with advanced-index
gathers and, under ``grad``, scatter-adds — random-access memory ops
that cost ~8 ms/step at 26.8k atoms (PROFILE.md (c)) and ~0.5 ms on the
3,350-atom flagship. On TPU the fast path for small gathers is a
ONE-HOT MATMUL (the md/analytic.py precedent): select rows of a
coordinate window with a {0,1} matrix on the MXU, and scatter gradients
back with the transposed contraction — no gather/scatter primitives at
all.

Layout: bonded terms are index-LOCAL in the caller's atom order (the
banded-exclusion observation, md/cells.py), so a term whose first atom
lies in ``[b*S, (b+1)*S)`` almost always has every atom inside the
2S-wide window ``[b*S, b*S + 2S)``. The kernel grid runs over the B
atom blocks; each step sees the block's coordinate slab plus the next
block as halo (two BlockSpec views of the same (3, NP) array — no
overlapping-window machinery needed), gathers each term type's atoms
via per-slot one-hot matmuls, evaluates energies and ANALYTIC
coordinate gradients (formulas validated against jax.grad oracles in
tests/unit/test_bonded_window.py), and scatters (3, W) gradient
windows into a revisited (8, NP) accumulator (rows 0-2 = dE/dx, row 3
lane b*S = block energy). Terms that span past the halo (rare:
SS-bridges, chain-crossing links) fall back to the XLA gather path.

Padding terms carry k = 0, which zeroes both energy and force exactly —
no masks in the hot loop. Inverse trig is unavailable in Mosaic
(measured round 5: acos/atan2 unimplemented), so the harmonic angle
uses a first-party arccos (Abramowitz-Stegun 4.4.45 polynomial + one
Newton step on cos, ~1e-7 rad) and the torsion avoids inverse trig
entirely: cos/sin(n*phi) come from the Chebyshev recurrence on
(cos phi, sin phi) read directly off the cross products.

Reference parity anchor: HarmonicBondForce/HarmonicAngleForce/
PeriodicTorsionForce semantics of the reference's OpenMM system
(src/pmarlo/simulation/__init__.py:64-71).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

_EPS = 1e-12
_HI = jax.lax.Precision.HIGHEST
_NMAX = 6  # amber periodicities are 1..6


def _acos(x):
    """First-party arccos: A&S 4.4.45 polynomial (|err| ~ 7e-5 rad)
    plus one Newton step on cos(theta) = x (~1e-7 rad). Mosaic has no
    acos/atan2 primitive."""
    ax = jnp.abs(x)
    p = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707288 + ax * (-0.2121144 + ax * (0.0742610 - 0.0187293 * ax))
    )
    th = jnp.where(x < 0.0, np.pi - p, p)
    s = jnp.maximum(jnp.sin(th), 1e-4)
    return th + (jnp.cos(th) - x) / s


def _row(v, i):
    return v[i:i + 1, :]


def _dot3(a, b):
    """Row-space dot of two (3, T) stacks -> (1, T)."""
    return jnp.sum(a * b, axis=0, keepdims=True)


def _cross3(a, b):
    return jnp.concatenate(
        [_row(a, 1) * _row(b, 2) - _row(a, 2) * _row(b, 1),
         _row(a, 2) * _row(b, 0) - _row(a, 0) * _row(b, 2),
         _row(a, 0) * _row(b, 1) - _row(a, 1) * _row(b, 0)], axis=0)


def _pack_type(idx, params, S, B, W):
    """Host-side packing of one term type.

    Returns (loc (B*8, T), par (B*8, T), T, far_rows) with T the
    lane-padded per-block maximum; padding terms have k = 0 (params
    row 0 is always the force constant). The row (sublane) dimension is
    padded from a/p to 8 because Mosaic requires block shapes with the
    second-to-last dim divisible by 8 — the kernel reads only the first
    a/p rows. far_rows indexes terms whose atoms do not fit any block
    window."""
    idx = np.asarray(idx)
    m = idx.shape[0]
    a = idx.shape[1]
    p = len(params)
    if m == 0:
        return None
    mn = idx.min(1)
    mx = idx.max(1)
    blk = np.minimum(mn // S, B - 1)
    near = mx < blk * S + W
    far_rows = np.nonzero(~near)[0]
    ni = idx[near]
    nblk = blk[near]
    counts = np.bincount(nblk, minlength=B)
    T = int(counts.max()) if counts.size else 0
    if T == 0:
        return None
    T = ((T + 127) // 128) * 128
    loc = np.zeros((B, 8, T), np.float32)
    par = np.zeros((B, 8, T), np.float32)
    order = np.argsort(nblk, kind="stable")
    pos = np.concatenate([[0], np.cumsum(counts)])
    for b in range(B):
        rows = order[pos[b]:pos[b + 1]]
        t = rows.shape[0]
        loc[b, :a, :t] = (ni[rows] - b * S).T
        for j, pr in enumerate(params):
            par[b, j, :t] = np.asarray(pr)[near][rows]
    return (loc.reshape(B * 8, T), par.reshape(B * 8, T), T, far_rows)


def build_bonded_window(
    system, *, stride: int = 256, interpret: bool = False,
) -> Optional[Callable]:
    """``fn(x (n, 3)) -> (energy, grad (n, 3))`` for the full bonded
    potential, or None when the system has no bonded terms (rigid-water
    boxes). ``grad`` is dE/dx (callers negate for forces), matching the
    ``jax.value_and_grad(bonded_energy)`` contract it replaces."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = int(stride)
    if S % 128 != 0:
        raise ValueError("stride must be a multiple of 128")
    n = system.n_atoms
    B = max(1, -(-n // S))
    NP = (B + 1) * S
    W = 2 * S

    tn = np.asarray(system.torsion_n)
    if tn.size and int(tn.max()) > _NMAX:
        raise ValueError(
            f"torsion periodicity {int(tn.max())} > {_NMAX} unsupported"
        )
    bonds = _pack_type(
        system.bond_idx, [system.bond_k, system.bond_r0], S, B, W)
    angles = _pack_type(
        system.angle_idx, [system.angle_k, system.angle_t0], S, B, W)
    tors = _pack_type(
        system.torsion_idx,
        [system.torsion_k, np.cos(np.asarray(system.torsion_phase)),
         np.sin(np.asarray(system.torsion_phase)),
         np.asarray(system.torsion_n, np.float64)], S, B, W)
    if bonds is None and angles is None and tors is None:
        return None

    # ---- far fallback (XLA gathers over the handful of long-span terms)
    fb = bonds[3] if bonds is not None else np.zeros(0, np.int64)
    fa = angles[3] if angles is not None else np.zeros(0, np.int64)
    ft = tors[3] if tors is not None else np.zeros(0, np.int64)
    have_far = fb.size or fa.size or ft.size
    if have_far:
        from .forces import dihedral_angles

        f_bi = jnp.asarray(np.asarray(system.bond_idx)[fb])
        f_bk = jnp.asarray(np.asarray(system.bond_k)[fb], jnp.float32)
        f_b0 = jnp.asarray(np.asarray(system.bond_r0)[fb], jnp.float32)
        f_ai = jnp.asarray(np.asarray(system.angle_idx)[fa])
        f_ak = jnp.asarray(np.asarray(system.angle_k)[fa], jnp.float32)
        f_a0 = jnp.asarray(np.asarray(system.angle_t0)[fa], jnp.float32)
        f_ti = jnp.asarray(np.asarray(system.torsion_idx)[ft])
        f_tk = jnp.asarray(np.asarray(system.torsion_k)[ft], jnp.float32)
        f_tn = jnp.asarray(np.asarray(system.torsion_n)[ft], jnp.float32)
        f_tp = jnp.asarray(
            np.asarray(system.torsion_phase)[ft], jnp.float32)

        def far_energy(x):
            e = jnp.zeros((), jnp.float32)
            if fb.size:
                d = x[f_bi[:, 0]] - x[f_bi[:, 1]]
                r = jnp.sqrt(jnp.sum(d * d, -1) + _EPS)
                e = e + jnp.sum(0.5 * f_bk * (r - f_b0) ** 2)
            if fa.size:
                v1 = x[f_ai[:, 0]] - x[f_ai[:, 1]]
                v2 = x[f_ai[:, 2]] - x[f_ai[:, 1]]
                ct = jnp.sum(v1 * v2, -1) / jnp.sqrt(
                    jnp.sum(v1 * v1, -1) * jnp.sum(v2 * v2, -1) + _EPS)
                th = jnp.arccos(jnp.clip(ct, -1.0 + 1e-7, 1.0 - 1e-7))
                e = e + jnp.sum(0.5 * f_ak * (th - f_a0) ** 2)
            if ft.size:
                phi = dihedral_angles(x, f_ti)
                e = e + jnp.sum(
                    f_tk * (1.0 + jnp.cos(f_tn * phi - f_tp)))
            return e

    # ---- kernel ----------------------------------------------------------
    def _oh(loc_row):
        """(W, T) one-hot from one (1, T) local-index row. Mosaic only
        lowers integer iota, so compare in i32 and cast the result."""
        sub = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
        return (sub == loc_row.astype(jnp.int32)).astype(jnp.float32)

    def _gather(x3, loc, s):
        return jnp.dot(x3, _oh(_row(loc, s)),
                       preferred_element_type=jnp.float32, precision=_HI)

    def _scatter(g, loc, s):
        """(3, W) window gradient from a (3, T) per-slot gradient."""
        return jax.lax.dot_general(
            g, _oh(_row(loc, s)), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)

    def kernel(*refs):
        it = iter(refs)
        xm_ref = next(it)
        xh_ref = next(it)
        bl = bp = al = ap = tl = tp = None
        if bonds is not None:
            bl, bp = next(it), next(it)
        if angles is not None:
            al, ap = next(it), next(it)
        if tors is not None:
            tl, tp = next(it), next(it)
        acc_ref = next(it)
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x3 = jnp.concatenate([xm_ref[...], xh_ref[...]], axis=1)  # (3, W)
        gwin = jnp.zeros((3, W), jnp.float32)
        e_blk = jnp.zeros((), jnp.float32)

        if bonds is not None:
            loc = bl[...]
            par = bp[...]
            p0 = _gather(x3, loc, 0)
            p1 = _gather(x3, loc, 1)
            d = p0 - p1
            r = jnp.sqrt(_dot3(d, d) + _EPS)
            kb = _row(par, 0)
            dr = r - _row(par, 1)
            e_blk = e_blk + jnp.sum(0.5 * kb * dr * dr)
            g0 = (kb * dr / r) * d
            gwin = gwin + _scatter(g0, loc, 0) - _scatter(g0, loc, 1)

        if angles is not None:
            loc = al[...]
            par = ap[...]
            p0 = _gather(x3, loc, 0)
            p1 = _gather(x3, loc, 1)
            p2 = _gather(x3, loc, 2)
            v1 = p0 - p1
            v2 = p2 - p1
            l1 = jnp.sqrt(_dot3(v1, v1) + _EPS)
            l2 = jnp.sqrt(_dot3(v2, v2) + _EPS)
            ct = jnp.clip(_dot3(v1, v2) / (l1 * l2),
                          -1.0 + 1e-7, 1.0 - 1e-7)
            st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 1e-12))
            th = _acos(ct)
            ka = _row(par, 0)
            dth = th - _row(par, 1)
            e_blk = e_blk + jnp.sum(0.5 * ka * dth * dth)
            co = ka * dth / st
            ga = -co * (v2 / l2 - ct * (v1 / l1)) / l1
            gc = -co * (v1 / l1 - ct * (v2 / l2)) / l2
            gwin = (gwin + _scatter(ga, loc, 0) + _scatter(gc, loc, 2)
                    - _scatter(ga + gc, loc, 1))

        if tors is not None:
            loc = tl[...]
            par = tp[...]
            p0 = _gather(x3, loc, 0)
            p1 = _gather(x3, loc, 1)
            p2 = _gather(x3, loc, 2)
            p3 = _gather(x3, loc, 3)
            b0 = p1 - p0
            b1 = p2 - p1
            b2 = p3 - p2
            n1 = _cross3(b0, b1)
            n2 = _cross3(b1, b2)
            n1sq = _dot3(n1, n1) + _EPS
            n2sq = _dot3(n2, n2) + _EPS
            nb1 = jnp.sqrt(_dot3(b1, b1) + _EPS)
            # cos/sin phi straight off the cross products — no atan2
            denom = jnp.sqrt(n1sq * n2sq)
            cphi = _dot3(n1, n2) / denom
            sphi = _dot3(_cross3(n1, n2), b1) / (nb1 * denom)
            # Chebyshev recurrence for cos/sin(j*phi), j = 1.._NMAX,
            # then select by each term's periodicity
            nn = _row(par, 3)
            cj, sj = cphi, sphi
            cn = jnp.where(nn == 1.0, cj, 0.0)
            sn = jnp.where(nn == 1.0, sj, 0.0)
            for j in range(2, _NMAX + 1):
                cj, sj = (cj * cphi - sj * sphi, sj * cphi + cj * sphi)
                cn = cn + jnp.where(nn == float(j), cj, 0.0)
                sn = sn + jnp.where(nn == float(j), sj, 0.0)
            kt = _row(par, 0)
            cg = _row(par, 1)
            sg = _row(par, 2)
            # E = k (1 + cos(n phi - gamma))
            e_blk = e_blk + jnp.sum(kt * (1.0 + cn * cg + sn * sg))
            # dE/dphi = k n (cn sg - sn cg)
            dEdphi = kt * nn * (cn * sg - sn * cg)
            # dphi/dp (validated vs jax.grad):
            #   d0 = -|b1|/|n1|^2 n1, d3 = |b1|/|n2|^2 n2
            #   dphi/db1 = t d0 - s d3, t = b0.b1/|b1|^2, s = b2.b1/|b1|^2
            d0 = -(nb1 / n1sq) * n1
            d3 = (nb1 / n2sq) * n2
            ib1 = 1.0 / (_dot3(b1, b1) + _EPS)
            t = _dot3(b0, b1) * ib1
            s = _dot3(b2, b1) * ib1
            g0 = dEdphi * d0
            g3 = dEdphi * d3
            g1 = dEdphi * (-(1.0 + t) * d0 + s * d3)
            g2 = dEdphi * (t * d0 - (1.0 + s) * d3)
            gwin = (gwin + _scatter(g0, loc, 0) + _scatter(g1, loc, 1)
                    + _scatter(g2, loc, 2) + _scatter(g3, loc, 3))

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        erow = jnp.where(lane == 0, e_blk, 0.0)
        g8 = jnp.concatenate(
            [gwin, erow, jnp.zeros((4, W), jnp.float32)], axis=0)
        off = pl.multiple_of(k * S, 128)
        acc_ref[:, pl.ds(off, W)] = acc_ref[:, pl.ds(off, W)] + g8

    # ---- pallas_call plumbing --------------------------------------------
    vmem = pltpu.VMEM
    ins_host = []
    specs = [
        pl.BlockSpec((3, S), (lambda k: (0, k)), memory_space=vmem),
        pl.BlockSpec((3, S), (lambda k: (0, k + 1)), memory_space=vmem),
    ]
    for packed in (bonds, angles, tors):
        if packed is None:
            continue
        loc, par, T, _ = packed
        ins_host += [jnp.asarray(loc), jnp.asarray(par)]
        specs += [
            pl.BlockSpec((8, T), (lambda k: (k, 0)), memory_space=vmem),
            pl.BlockSpec((8, T), (lambda k: (k, 0)), memory_space=vmem),
        ]
    acc_spec = pl.BlockSpec((8, NP), (lambda k: (0, 0)), memory_space=vmem)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)

    def _run(xf):
        return pl.pallas_call(
            kernel, grid=(B,), compiler_params=params,
            out_shape=jax.ShapeDtypeStruct((8, NP), jnp.float32),
            in_specs=specs, out_specs=acc_spec, interpret=interpret,
        )(xf, xf, *ins_host)

    def fn(x):
        xf = jnp.zeros((NP, 3), jnp.float32).at[:n].set(
            x.astype(jnp.float32)).T
        acc = _run(xf)
        e = jnp.sum(acc[3])
        g = acc[0:3, :n].T
        if have_far:
            e_f, g_f = jax.value_and_grad(far_energy)(x.astype(jnp.float32))
            e = e + e_f
            g = g + g_f
        return e, g

    fn.n_blocks = B
    fn.far_terms = int(fb.size + fa.size + ft.size)
    return fn


__all__ = ["build_bonded_window"]
