"""KKT residual, condensed system assembly, solve + expansion, and a
matrix-free 6x6-block matvec for iterative refinement.

The primal-dual point is w = (x, r, s, y, z, t):
  x primal variables, r equality slacks (g(x) = r), s cone slacks
  (h(x) = s in K), y equality duals, z cone duals, t cone-slack duals.

6-block residual R(w) (reference src/solver/residual.jl:1-51):
  rx = fx + gx'y + hx'z
  rr = lambda + rho*r - y
  rs = -z - t
  ry = g - r
  rz = h - s
  rt = s o t - kappa*e

Newton system J dw = R with regularization (+eps_p primal / -eps_d dual,
reference residual_jacobian_variables.jl:83-105), condensed by eliminating
(r, s, t) to the symmetric quasidefinite (n + m_e + m_c) system
(reference residual.jl:53-101, residual_jacobian_variables.jl:110-167):

  [ Hxx+eps_p*I      gx'              hx'          ] [dx]   [ rx            ]
  [ gx           (-1/(rho+eps_p)-eps_d)*I   0      ] [dy] = [ ry + rr/(rho+eps_p) ]
  [ hx               0          -eps_d*I - M^-1*Cv ] [dz]   [ rz + M^-1(Cv rs + rt)]

with Cv = arrow(s - eps_d*e), M = arrow(t) + eps_p*Cv, and exact expansion
(reference search_direction.jl:59-101):
  dr = (rr + dy)/(rho+eps_p)
  ds = M^-1 (rt + Cv (rs + dz))
  dt = Cv^-1 (rt - arrow(t) ds)

The update convention is w_new = w - alpha * dw (reference solve.jl:193-326).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from calipso_tpu.ops import cones
from calipso_tpu.ops.ldl import ldl_factor, ldl_solve, inertia_counts


class Blocks(NamedTuple):
    """A vector in the 6-block residual/step space."""

    x: jnp.ndarray
    r: jnp.ndarray
    s: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    t: jnp.ndarray

    @property
    def all(self):
        return jnp.concatenate(list(self))

    @property
    def primals(self):
        return jnp.concatenate([self.x, self.r, self.s])


def residual(fx, gty_x, htz_x, g, h, cone_prod, cone_target, point, kappa, rho, lam):
    """6-block KKT residual at `point` (reference residual.jl:1-51)."""
    rx = fx + gty_x + htz_x
    rr = lam + rho * point.r - point.y
    rs = -point.z - point.t
    ry = g - point.r
    rz = h - point.s
    rt = cone_prod - kappa * cone_target
    return Blocks(rx, rr, rs, ry, rz, rt)


def condensed_matrix(layout, Hxx, gx, hx, s, t, rho, eps_p, eps_d):
    """Assemble the dense symmetric condensed KKT matrix (see module doc).
    The SOC cone block is mildly nonsymmetric; it is symmetrized here (the
    reference equivalently keeps one triangle for QDLDL) and iterative
    refinement against the exact 6-block operator absorbs the difference."""
    n = Hxx.shape[0]
    me, mc = gx.shape[0], hx.shape[0]
    dtype = Hxx.dtype

    K11 = Hxx + eps_p * jnp.eye(n, dtype=dtype)
    Keq = (-1.0 / (rho + eps_p) - eps_d) * jnp.eye(me, dtype=dtype)
    Kcone = cones.condensed_block(layout, s, t, eps_p, eps_d, dtype)
    Kcone = 0.5 * (Kcone + Kcone.T)

    top = jnp.concatenate([K11, gx.T, hx.T], axis=1)
    mid = jnp.concatenate([gx, Keq, jnp.zeros((me, mc), dtype)], axis=1)
    bot = jnp.concatenate([hx, jnp.zeros((mc, me), dtype), Kcone], axis=1)
    return jnp.concatenate([top, mid, bot], axis=0)


def condensed_rhs(layout, res: Blocks, s, t, rho, eps_p, eps_d):
    """Condense the 6-block residual to the symmetric RHS (reference
    residual.jl:53-101)."""
    e = layout.target(res.x.dtype)
    v = s - eps_d * e
    w = t + eps_p * v
    req = res.y + res.r / (rho + eps_p)
    rcone = res.z + cones.arrow_solve(layout, w, cones.product(layout, v, res.s) + res.t)
    return jnp.concatenate([res.x, req, rcone])


def expand(layout, res: Blocks, d_sym, n, me, mc, s, t, rho, eps_p, eps_d):
    """Recover (dr, ds, dt) from the condensed solution exactly (reference
    search_direction.jl:59-101)."""
    dx = d_sym[:n]
    dy = d_sym[n : n + me]
    dz = d_sym[n + me :]
    e = layout.target(res.x.dtype)
    v = s - eps_d * e
    w = t + eps_p * v
    dr = (res.r + dy) / (rho + eps_p)
    ds = cones.arrow_solve(
        layout, w, res.t + cones.product(layout, v, res.s + dz)
    )
    dt = cones.arrow_solve(layout, v, res.t - cones.product(layout, t, ds))
    return Blocks(dx, dr, ds, dy, dz, dt)


def matvec(layout, Hxx, gx, hx, s, t, rho, eps_p, eps_d, d: Blocks) -> Blocks:
    """Exact regularized 6-block Jacobian-vector product J @ d, matrix-free
    (replaces the reference's assembled sparse jacobian_variables for
    iterative refinement, iterative_refinement.jl:1-53)."""
    e = layout.target(d.x.dtype)
    v = s - eps_d * e
    ox = Hxx @ d.x + eps_p * d.x + gx.T @ d.y + hx.T @ d.z
    orr = (rho + eps_p) * d.r - d.y
    os = eps_p * d.s - d.z - d.t
    oy = gx @ d.x - d.r - eps_d * d.y
    oz = hx @ d.x - d.s - eps_d * d.z
    ot = cones.product(layout, t, d.s) + cones.product(layout, v, d.t)
    return Blocks(ox, orr, os, oy, oz, ot)


class Factorization(NamedTuple):
    L: jnp.ndarray
    d: jnp.ndarray
    eps_p: jnp.ndarray
    eps_d: jnp.ndarray


def factorize(layout, Hxx, gx, hx, s, t, rho, eps_p, eps_d):
    K = condensed_matrix(layout, Hxx, gx, hx, s, t, rho, eps_p, eps_d)
    L, dvec = ldl_factor(K)
    return Factorization(L, dvec, eps_p, eps_d)


def inertia_ok(fact: Factorization, n, me, mc):
    """Target inertia (n positive, m_e+m_c negative, 0 zero) -- reference
    inertia.jl:7-11."""
    pos, neg, zero = inertia_counts(fact.d)
    return (pos == n) & (neg == me + mc) & (zero == 0)


def solve_with(layout, fact: Factorization, res: Blocks, s, t, rho, n, me, mc) -> Blocks:
    """Condense -> LDL solve -> expand, for an arbitrary 6-block RHS."""
    rhs = condensed_rhs(layout, res, s, t, rho, fact.eps_p, fact.eps_d)
    d_sym = ldl_solve(fact.L, fact.d, rhs)
    return expand(layout, res, d_sym, n, me, mc, s, t, rho, fact.eps_p, fact.eps_d)
