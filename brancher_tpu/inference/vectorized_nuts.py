"""Vectorized (chain-batched) NUTS: all chains advance in lockstep.

The general engine in ``nuts.py`` vmaps a per-chain sampler whose nested
while-loops serialize poorly on TPU (each chain's tiny leapfrog is a
separate masked lane; per-iteration latency dominates).  This module is
the TPU-first reformulation (cf. the public "vectorized / autobatched
NUTS" designs of tfp.mcmc and numpyro, PAPERS.md): the chain axis is
EXPLICIT — every leapfrog step is one batched ``value_and_grad_fn`` call
over [C, d] (MXU matmuls for models like logistic regression, optionally
the fused Pallas kernel), and the recursive tree becomes ONE while loop
over a flat leaf index.

Key observation making this exact (not an approximation): the tree
DOUBLING SCHEDULE is deterministic and shared by every chain — leaf n
belongs to doubling floor(log2 n) at in-subtree position m = n - 2^d.
Only the per-chain direction, proposal swaps and stopping differ, and
those are cheap [C]-vector masks.  The checkpoint-stack U-turn trick
indexes by popcount(m) — a per-iteration SCALAR — so bookkeeping adds no
per-chain control flow at all.  Chains that stop (U-turn / divergence /
discarded subtree) go inactive and idle until the loop drains.

Adaptation matches ops/batched_hmc.py: shared dual-averaged step size
(mean accept over chains — pmean/psum over ICI when the chain axis is
sharded) and a shared diagonal mass from cross-chain moments.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .adaptation import build_warmup_schedule, da_init, da_restart, da_update

Array = jax.Array


def _gmean(x, axis_name):
    """Mean over chains, then over the sharded chain axis (psum/ICI)."""
    m = jnp.mean(x)
    return jax.lax.pmean(m, axis_name) if axis_name else m


def _gsum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name else x


class VectorizedNUTSResult(NamedTuple):
    samples: Array  # [C, S, d]
    accept_prob: Array  # [C, S]
    diverging: Array  # [C, S]
    num_leapfrog: Array  # [S] (shared per draw: loop iterations executed)
    step_size: Array
    inv_mass: Array
    warmup_leapfrog: Array  # scalar: loop iterations during warmup
    chain_leapfrog: Array  # [S] mean per-chain LIVE leapfrogs per draw —
    # the lockstep-waste diagnostic: num_leapfrog/chain_leapfrog is the
    # factor a compacted (per-chain early-exit) engine could recover


def _ke(r: Array, inv_mass: Array) -> Array:
    return 0.5 * jnp.sum(r * r * inv_mass[None, :], axis=-1)


def _turning(rho: Array, r_a: Array, r_b: Array, inv_mass: Array) -> Array:
    va = r_a * inv_mass[None, :]
    vb = r_b * inv_mass[None, :]
    return jnp.logical_or(
        jnp.sum(rho * va, -1) <= 0.0, jnp.sum(rho * vb, -1) <= 0.0
    )


class _S(NamedTuple):
    n: Array
    # global tree (per chain)
    left_z: Array; left_r: Array; left_grad: Array
    right_z: Array; right_r: Array; right_grad: Array
    prop_z: Array; prop_val: Array; prop_grad: Array
    lw: Array; r_sum: Array
    # moving end
    m_z: Array; m_r: Array; m_grad: Array
    # subtree
    s_lw: Array; s_cum: Array
    sp_z: Array; sp_val: Array; sp_grad: Array
    s_failed: Array
    # checkpoint stacks, DEPTH-MAJOR [kdim, C, d] (round 5): slot writes
    # are contiguous [1, C, d] rows instead of the strided [C, 1, d]
    # writes of the old chain-major layout.  Only the momentum and the
    # momentum-sum are stored — the generalized (Stan-style) U-turn
    # criterion never reads checkpoint POSITIONS, so the z stack the
    # engine carried through round 4 was dead weight.
    r_ck: Array; rs_ck: Array
    # flags / stats
    dirn: Array
    active: Array
    diverging: Array
    sum_acc: Array; cnt: Array


def nuts_transition_batched(
    value_and_grad_fn: Callable[[Array], Tuple[Array, Array]],
    z: Array,
    val: Array,
    grad: Array,
    eps: Array,
    inv_mass: Array,
    key: Array,
    max_depth: int = 10,
    max_delta_energy: float = 1000.0,
    chunk: int = 1,
):
    """One NUTS draw for all chains.  value/grad are of the LOG posterior.

    chunk: leaf iterations executed per while-loop step as one unrolled
    ``lax.scan``.  Exact for any value (every per-chain update is masked
    by the active/live flags and the n < max_n budget gate), but MEASURED
    SLOWER than chunk=1 at bench scale on the current backend (6.15 s vs
    3.67 s sampler time, and ~6x slower cold compile — round 2,
    scripts/exp_nuts_chunk.py), so the default stays 1; kept as a tuning
    knob for backends where while-iteration overhead dominates.
    """
    c, d = z.shape
    dtype = z.dtype
    kdim = max_depth + 1
    k_mom, k_loop = jax.random.split(key)

    r0 = jax.random.normal(k_mom, (c, d), dtype) / jnp.sqrt(inv_mass)[None, :]
    h0 = -val + _ke(r0, inv_mass)

    zeros_cd = jnp.zeros((c, d), dtype)
    s0 = _S(
        n=jnp.ones((), jnp.int32),
        left_z=z, left_r=r0, left_grad=grad,
        right_z=z, right_r=r0, right_grad=grad,
        prop_z=z, prop_val=val, prop_grad=grad,
        lw=jnp.zeros((c,), dtype), r_sum=r0,
        m_z=z, m_r=r0, m_grad=grad,
        s_lw=jnp.full((c,), -jnp.inf, dtype), s_cum=zeros_cd,
        sp_z=z, sp_val=val, sp_grad=grad,
        s_failed=jnp.zeros((c,), bool),
        r_ck=jnp.zeros((kdim, c, d), dtype),
        rs_ck=jnp.zeros((kdim, c, d), dtype),
        dirn=jnp.ones((c,), dtype),
        active=jnp.ones((c,), bool),
        diverging=jnp.zeros((c,), bool),
        sum_acc=jnp.zeros((c,), dtype), cnt=jnp.zeros((c,), dtype),
    )

    max_n = jnp.asarray(2**max_depth, jnp.int32)

    def cond(s: _S):
        return jnp.logical_and(s.n < max_n, jnp.any(s.active))

    def body(s: _S):
        n = s.n
        # static-schedule metadata (per-iteration scalars)
        depth = 31 - jax.lax.clz(n)
        m = n - (jnp.asarray(1, jnp.int32) << depth)
        is_start = m == 0
        sub_size = jnp.asarray(1, jnp.int32) << depth
        is_end = m == sub_size - 1
        pc = jax.lax.population_count(m)
        t_ones = jax.lax.population_count((m ^ (m + 1)) >> 1)

        kn = jax.random.fold_in(k_loop, n)
        k_dir, k_swap, k_take = jax.random.split(kn, 3)

        # --- subtree start: per-chain direction + moving end + reset ------
        new_dir = jnp.where(
            jax.random.bernoulli(k_dir, 0.5, (c,)), 1.0, -1.0
        ).astype(dtype)
        dirn = jnp.where(is_start, new_dir, s.dirn)
        take_right = dirn > 0

        def sel_end(r_val, l_val):
            return jnp.where(take_right[:, None], r_val, l_val)

        m_z = jnp.where(is_start, sel_end(s.right_z, s.left_z), s.m_z)
        m_r = jnp.where(is_start, sel_end(s.right_r, s.left_r), s.m_r)
        m_grad = jnp.where(is_start, sel_end(s.right_grad, s.left_grad), s.m_grad)
        s_lw = jnp.where(is_start, jnp.full((c,), -jnp.inf, dtype), s.s_lw)
        s_cum = jnp.where(is_start, jnp.zeros_like(s.s_cum), s.s_cum)
        s_failed = jnp.where(is_start, jnp.zeros((c,), bool), s.s_failed)

        # --- one batched leapfrog from the moving end ---------------------
        eps_c = (eps * dirn)[:, None]
        r_half = m_r + 0.5 * eps_c * m_grad
        z_new = m_z + eps_c * inv_mass[None, :] * r_half
        val_new, grad_new = value_and_grad_fn(z_new)
        r_new = r_half + 0.5 * eps_c * grad_new

        h = -val_new + _ke(r_new, inv_mass)
        h = jnp.where(jnp.isnan(h), jnp.inf, h)
        lw_leaf = h0 - h
        dvg = (h - h0) > max_delta_energy
        # chunked execution can overshoot the leaf budget by < chunk
        # iterations; out-of-range leaves must be complete no-ops
        live = jnp.logical_and(
            jnp.logical_and(s.active, jnp.logical_not(s_failed)), n < max_n
        )

        acc = jnp.exp(jnp.minimum(lw_leaf, 0.0))
        sum_acc = s.sum_acc + jnp.where(live, acc, 0.0)
        cnt = s.cnt + jnp.where(live, 1.0, 0.0)

        # --- checkpoints (store BEFORE adding this leaf's momentum) -------
        even = (m % 2) == 0

        def store(ck, new_val):
            # depth-major: one contiguous [1, C, d] row at scalar slot pc
            updated = jax.lax.dynamic_update_slice_in_dim(
                ck, new_val[None], pc, axis=0
            )
            return jnp.where(even, updated, ck)

        r_ck = store(s.r_ck, r_new)
        rs_ck = store(s.rs_ck, s_cum)

        # --- progressive multinomial within the subtree -------------------
        s_cum_new = s_cum + r_new
        s_lw_new = jnp.logaddexp(s_lw, lw_leaf)
        swap = jax.random.uniform(k_swap, (c,)) < jnp.exp(lw_leaf - s_lw_new)
        sp_z = jnp.where((live & swap)[:, None], z_new, s.sp_z)
        sp_val = jnp.where(live & swap, val_new, s.sp_val)
        sp_grad = jnp.where((live & swap)[:, None], grad_new, s.sp_grad)

        # --- U-turn checks vs checkpoint stack (odd leaves) ---------------
        # one batched sweep over all K slots ([K,C,d] einsums) with a [K]
        # range mask — a single fused op instead of an unrolled slot loop
        # (major compile-time win for the while body)
        rho_all = s_cum_new[None, :, :] - rs_ck  # [K, C, d]
        dot_a = jnp.einsum("kcd,kcd->ck", rho_all, r_ck * inv_mass[None, None, :])
        vb = (r_new * inv_mass[None, :])[None, :, :]
        dot_b = jnp.einsum("kcd,kcd->ck", rho_all, jnp.broadcast_to(vb, rho_all.shape))
        turn_all = jnp.logical_or(dot_a <= 0.0, dot_b <= 0.0)  # [C, K]
        slot_ids = jnp.arange(kdim, dtype=jnp.int32)
        in_range = jnp.logical_and(slot_ids >= pc - t_ones, slot_ids < pc)  # [K]
        turn_sub = jnp.any(jnp.logical_and(turn_all, in_range[None, :]), axis=1)
        turn_sub = jnp.logical_and(turn_sub, jnp.logical_not(even))

        new_fail = live & (dvg | turn_sub)
        s_failed = jnp.logical_or(s_failed, new_fail)
        diverging = jnp.logical_or(s.diverging, live & dvg)

        upd = live & jnp.logical_not(new_fail)
        s_lw = jnp.where(upd, s_lw_new, s_lw)
        s_cum = jnp.where(upd[:, None], s_cum_new, s_cum)
        m_z = jnp.where(upd[:, None], z_new, m_z)
        m_r = jnp.where(upd[:, None], r_new, m_r)
        m_grad = jnp.where(upd[:, None], grad_new, m_grad)

        # --- subtree end: merge into the global tree ----------------------
        merging = jnp.logical_and(is_end, upd)
        p_take = jnp.exp(jnp.minimum(s_lw - s.lw, 0.0))
        take = jnp.logical_and(merging, jax.random.uniform(k_take, (c,)) < p_take)
        prop_z = jnp.where(take[:, None], sp_z, s.prop_z)
        prop_val = jnp.where(take, sp_val, s.prop_val)
        prop_grad = jnp.where(take[:, None], sp_grad, s.prop_grad)

        right_sel = jnp.logical_and(merging, take_right)
        left_sel = jnp.logical_and(merging, jnp.logical_not(take_right))
        right_z = jnp.where(right_sel[:, None], m_z, s.right_z)
        right_r = jnp.where(right_sel[:, None], m_r, s.right_r)
        right_grad = jnp.where(right_sel[:, None], m_grad, s.right_grad)
        left_z = jnp.where(left_sel[:, None], m_z, s.left_z)
        left_r = jnp.where(left_sel[:, None], m_r, s.left_r)
        left_grad = jnp.where(left_sel[:, None], m_grad, s.left_grad)

        r_sum_new = s.r_sum + s_cum
        lw_new = jnp.logaddexp(s.lw, s_lw)
        r_sum = jnp.where(merging[:, None], r_sum_new, s.r_sum)
        lw = jnp.where(merging, lw_new, s.lw)

        full_turn = _turning(r_sum, left_r, right_r, inv_mass)

        # deactivate: failed subtree (discarded) or full-tree U-turn
        active = s.active
        active = jnp.logical_and(active, jnp.logical_not(is_end & s_failed))
        active = jnp.logical_and(active, jnp.logical_not(new_fail))
        active = jnp.logical_and(active, jnp.logical_not(merging & full_turn))

        return _S(
            n=n + 1,
            left_z=left_z, left_r=left_r, left_grad=left_grad,
            right_z=right_z, right_r=right_r, right_grad=right_grad,
            prop_z=prop_z, prop_val=prop_val, prop_grad=prop_grad,
            lw=lw, r_sum=r_sum,
            m_z=m_z, m_r=m_r, m_grad=m_grad,
            s_lw=s_lw, s_cum=s_cum,
            sp_z=sp_z, sp_val=sp_val, sp_grad=sp_grad,
            s_failed=s_failed,
            r_ck=r_ck, rs_ck=rs_ck,
            dirn=dirn, active=active, diverging=diverging,
            sum_acc=sum_acc, cnt=cnt,
        )

    if chunk > 1:
        def chunk_body(s: _S) -> _S:
            s, _ = jax.lax.scan(lambda ss, _: (body(ss), None), s, None,
                                length=chunk)
            return s

        s = jax.lax.while_loop(cond, chunk_body, s0)
    else:
        s = jax.lax.while_loop(cond, body, s0)

    accept_prob = s.sum_acc / jnp.maximum(s.cnt, 1.0)
    return (
        s.prop_z, s.prop_val, s.prop_grad,
        accept_prob, s.diverging, s.n - 1, jnp.mean(s.cnt),
    )


class _PS(NamedTuple):
    """Per-chain state of the draw-PIPELINED sampling loop: every field
    that was a scalar in the lockstep engine (leaf index n, schedule
    metadata, draw counter) is a [C] vector here."""

    it: Array  # scalar: global loop iteration (RNG folding)
    draw: Array  # [C] draws completed
    n: Array  # [C] per-chain leaf index in the current tree (0 = fresh)
    z: Array; val: Array; grad: Array  # [C(,d)] current position
    h0: Array  # [C] energy at draw start
    left_z: Array; left_r: Array; left_grad: Array
    right_z: Array; right_r: Array; right_grad: Array
    prop_z: Array; prop_val: Array; prop_grad: Array
    lw: Array; r_sum: Array
    m_z: Array; m_r: Array; m_grad: Array
    s_lw: Array; s_cum: Array
    sp_z: Array; sp_val: Array; sp_grad: Array
    s_failed: Array
    # depth-major checkpoint stacks [kdim, C, d] (ROADMAP r4 #10 /
    # VERDICT r4 weak #1): per-chain slot indices made the old
    # chain-major stacks vector-index scatters (ck.at[cidx, pc].set),
    # which this backend lowers to a serialized per-chain scatter —
    # the dominant per-iteration cost of the round-4 engine.  Slot-major
    # rows are now written with STATIC-index masked selects (see body).
    r_ck: Array; rs_ck: Array
    dirn: Array
    active: Array  # [C] current tree still growing
    dvg_draw: Array  # [C] divergence seen this draw
    sum_acc: Array; cnt: Array
    # lookahead-B output ring (ROADMAP r3 #4): chains write completed
    # draws into slot (draw % B).  Round 5: ring rows are also written
    # with static-slot masked selects (no dump row, no vector scatter).
    ring_z: Array  # [B, C, d]
    ring_acc: Array  # [B, C]
    ring_dvg: Array  # [B, C]
    ring_cnt: Array  # [B, C]
    flushed: Array  # scalar: rows already copied to the output buffers
    # output buffers, flushed one shared row at a time via
    # dynamic_update_slice (aliases in place on every backend measured)
    zs_out: Array  # [S, C, d]
    acc_out: Array  # [S, C]
    dvg_out: Array  # [S, C]
    cnt_out: Array  # [S, C]


def _pipelined_sampling(
    value_and_grad_fn, z, val, grad, eps, inv_mass, key, num_samples,
    max_depth, max_delta_energy, lookahead: int = 16,
):
    """Sampling phase with per-chain draw pipelining (ROADMAP r2 #10).

    The lockstep engine runs max-over-chains tree iterations per draw;
    measured waste is 1.0x on well-conditioned posteriors, 1.35x on the
    non-centered ARD headline config, and 3.16x on the eight-schools
    funnel (scripts/exp_nuts_waste.py).  Here each chain refreshes
    momentum and starts its NEXT draw in the very iteration after its
    U-turn — total iterations approach max_c(sum_draws tree_c) ~ S *
    mean instead of sum_draws(max_c tree_c) (measured: 29k vs 74k
    iterations on the funnel).

    Output writes use a LOOKAHEAD RING of ``lookahead`` rows (ROADMAP
    r3 #4): on this backend a scattered write into a while-loop carry
    copies the whole buffer per iteration
    (scripts/exp_scatter_in_while.py: 0.95 ms/iter for the [S+1, C, d]
    buffer at bench scale — which made the first pipelined engine
    SLOWER despite 2.5x fewer iterations).  Chains scatter completed
    draws into the small ring (slot draw % B; ~1 MB copied/iter), and
    whenever every chain has passed row ``flushed`` that row moves to
    the big output buffer with a shared-scalar-row dynamic_update_slice
    (aliases in place: 0.027 ms/iter measured).  A chain more than B
    draws ahead of the slowest stalls (idles) until the row frees; the
    slowest chain never stalls, so there is no deadlock.

    ROUND-5 LAYOUT (ROADMAP r4 #10 / VERDICT r4 weak #1): the round-4
    engine paid ~7x per iteration vs lockstep on axon because its
    per-chain checkpoint writes (``ck.at[cidx, pc].set`` on chain-major
    [C, kdim, d] stacks) and ring writes were VECTOR-INDEX SCATTERS,
    which this backend serializes per chain.  The stacks are now
    depth-major [kdim, C, d] and every slot write is a static-index
    masked SELECT (elementwise, aliasable); the ring likewise.  There
    is no scatter of any kind left in the loop body.

    RE-MEASURED on the headline config (2026-08-21, C=1024): 8.33 s →
    4.56 s sampling wall (0.73 → 0.40 ms/iteration, 1.8x) with
    lockstep unchanged at 2.73 s / 0.108 ms.  The residual 3.7x
    per-iteration gap is NOT a memory op: the body is now pure
    elementwise selects + the same leapfrog/einsum as lockstep, but it
    runs ~2x the op count every iteration (momentum refresh, draw
    bookkeeping, ring maintenance run per-iteration instead of
    per-draw) on a backend whose while-loop iterations are LATENCY-
    bound (round-2 measurement: ~0.5 ms/iteration floor for NUTS-class
    bodies; CLAUDE.md).  On this backend the 1.35x iteration saving of
    the headline posterior cannot beat that body tax, so lockstep
    remains the default and bench engine; the pipelined engine wins
    where the waste factor is larger (3.16x on the eight-schools
    funnel) or iteration dispatch is cheap.

    RNG: per-iteration keys fold_in(key, it) — a different (but equally
    valid) stream than the lockstep engine, so results are
    deterministic per seed but not bit-equal across engines (and the
    stall schedule means draws also differ from the r2 scatter-write
    pipelined engine).
    """
    c, d = z.shape
    dtype = z.dtype
    kdim = max_depth + 1
    max_n = jnp.asarray(2**max_depth, jnp.int32)
    s_len = num_samples
    B = max(2, min(int(lookahead), s_len))
    neg_inf = jnp.full((c,), -jnp.inf, dtype)
    zeros_c = jnp.zeros((c,), dtype)
    zeros_cd = jnp.zeros((c, d), dtype)

    s0 = _PS(
        it=jnp.zeros((), jnp.int32),
        draw=jnp.zeros((c,), jnp.int32),
        n=jnp.zeros((c,), jnp.int32),  # 0 => start a fresh draw
        z=z, val=val, grad=grad, h0=zeros_c,
        left_z=z, left_r=zeros_cd, left_grad=grad,
        right_z=z, right_r=zeros_cd, right_grad=grad,
        prop_z=z, prop_val=val, prop_grad=grad,
        lw=zeros_c, r_sum=zeros_cd,
        m_z=z, m_r=zeros_cd, m_grad=grad,
        s_lw=neg_inf, s_cum=zeros_cd,
        sp_z=z, sp_val=val, sp_grad=grad,
        s_failed=jnp.zeros((c,), bool),
        r_ck=jnp.zeros((kdim, c, d), dtype),
        rs_ck=jnp.zeros((kdim, c, d), dtype),
        dirn=jnp.ones((c,), dtype),
        active=jnp.zeros((c,), bool),
        dvg_draw=jnp.zeros((c,), bool),
        sum_acc=zeros_c, cnt=zeros_c,
        ring_z=jnp.zeros((B, c, d), dtype),
        ring_acc=jnp.zeros((B, c), dtype),
        ring_dvg=jnp.zeros((B, c), bool),
        ring_cnt=jnp.zeros((B, c), dtype),
        flushed=jnp.zeros((), jnp.int32),
        zs_out=jnp.zeros((s_len, c, d), dtype),
        acc_out=jnp.zeros((s_len, c), dtype),
        dvg_out=jnp.zeros((s_len, c), bool),
        cnt_out=jnp.zeros((s_len, c), dtype),
    )

    def cond(s: _PS):
        return jnp.any(s.draw < s_len)

    def body(s: _PS) -> _PS:
        working = s.draw < s_len  # chains with draws left
        # one key per iteration; [C]-shaped draws are iid across lanes
        # and iterations — per-chain key trees would buy nothing
        k_mom, k_dir, k_swap, k_take = jax.random.split(
            jax.random.fold_in(key, s.it), 4
        )

        # --- per-chain draw start: refresh momentum, reset the tree ------
        # ring backpressure: a chain B draws ahead of the slowest would
        # overwrite an unflushed ring row — it idles until the row frees
        can_start = (s.draw - s.flushed) < B
        starting = jnp.logical_and(jnp.logical_and(s.n == 0, working),
                                   can_start)
        st = starting[:, None]
        r0 = jax.random.normal(k_mom, (c, d), dtype) / jnp.sqrt(inv_mass)[None, :]
        h0 = jnp.where(starting, -s.val + _ke(r0, inv_mass), s.h0)
        left_z = jnp.where(st, s.z, s.left_z)
        left_r = jnp.where(st, r0, s.left_r)
        left_grad = jnp.where(st, s.grad, s.left_grad)
        right_z = jnp.where(st, s.z, s.right_z)
        right_r = jnp.where(st, r0, s.right_r)
        right_grad = jnp.where(st, s.grad, s.right_grad)
        prop_z = jnp.where(st, s.z, s.prop_z)
        prop_val = jnp.where(starting, s.val, s.prop_val)
        prop_grad = jnp.where(st, s.grad, s.prop_grad)
        lw = jnp.where(starting, 0.0, s.lw)
        r_sum = jnp.where(st, r0, s.r_sum)
        active = jnp.where(starting, True, s.active)
        dvg_draw = jnp.where(starting, False, s.dvg_draw)
        sum_acc = jnp.where(starting, 0.0, s.sum_acc)
        cnt = jnp.where(starting, 0.0, s.cnt)
        n = jnp.where(starting, 1, s.n)  # leaf 1 processes this iteration

        # --- per-chain static-schedule metadata ([C] vectors) ------------
        n_safe = jnp.maximum(n, 1)
        depth = 31 - jax.lax.clz(n_safe)
        m = n_safe - (jnp.asarray(1, jnp.int32) << depth)
        is_start = m == 0
        sub_size = jnp.asarray(1, jnp.int32) << depth
        is_end = m == sub_size - 1
        pc = jax.lax.population_count(m)
        t_ones = jax.lax.population_count((m ^ (m + 1)) >> 1)
        even = (m % 2) == 0

        # --- subtree start: per-chain direction + moving end + reset ------
        new_dir = jnp.where(
            jax.random.bernoulli(k_dir, 0.5, (c,)), 1.0, -1.0
        ).astype(dtype)
        dirn = jnp.where(is_start, new_dir, s.dirn)
        take_right = dirn > 0

        def sel_end(r_val, l_val):
            return jnp.where(take_right[:, None], r_val, l_val)

        m_z = jnp.where(is_start[:, None], sel_end(right_z, left_z), s.m_z)
        m_r = jnp.where(is_start[:, None], sel_end(right_r, left_r), s.m_r)
        m_grad = jnp.where(is_start[:, None],
                           sel_end(right_grad, left_grad), s.m_grad)
        s_lw = jnp.where(is_start, -jnp.inf, s.s_lw)
        s_cum = jnp.where(is_start[:, None], 0.0, s.s_cum)
        s_failed = jnp.where(is_start, False, s.s_failed)

        # --- one batched leapfrog from the moving end ---------------------
        eps_c = (eps * dirn)[:, None]
        r_half = m_r + 0.5 * eps_c * m_grad
        z_new = m_z + eps_c * inv_mass[None, :] * r_half
        val_new, grad_new = value_and_grad_fn(z_new)
        r_new = r_half + 0.5 * eps_c * grad_new

        h = -val_new + _ke(r_new, inv_mass)
        h = jnp.where(jnp.isnan(h), jnp.inf, h)
        lw_leaf = h0 - h
        dvg = (h - h0) > max_delta_energy
        live = jnp.logical_and(
            jnp.logical_and(active, jnp.logical_not(s_failed)), working
        )

        acc = jnp.exp(jnp.minimum(lw_leaf, 0.0))
        sum_acc = sum_acc + jnp.where(live, acc, 0.0)
        cnt = cnt + jnp.where(live, 1.0, 0.0)

        # --- checkpoints: depth-major static-slot masked selects ----------
        # (the shared-slot layout, ROADMAP r4 #10): slot k's row is a
        # fixed [C, d] buffer updated by an ELEMENTWISE select on the
        # per-chain mask (pc == k) — no vector-index scatter anywhere in
        # the loop body.  kdim selects cost ~2·kdim·C·d bytes of VPU
        # traffic per iteration vs the serialized per-chain scatter the
        # old ck.at[cidx, pc].set lowered to on this backend.
        wmask = even & live

        def store(ck, new_val):
            return jnp.stack([
                jnp.where((wmask & (pc == k))[:, None], new_val, ck[k])
                for k in range(kdim)
            ])

        r_ck = store(s.r_ck, r_new)
        rs_ck = store(s.rs_ck, s_cum)

        # --- progressive multinomial within the subtree -------------------
        s_cum_new = s_cum + r_new
        s_lw_new = jnp.logaddexp(s_lw, lw_leaf)
        swap = jax.random.uniform(k_swap, (c,)) < jnp.exp(lw_leaf - s_lw_new)
        sp_z = jnp.where((live & swap)[:, None], z_new, s.sp_z)
        sp_val = jnp.where(live & swap, val_new, s.sp_val)
        sp_grad = jnp.where((live & swap)[:, None], grad_new, s.sp_grad)

        # --- U-turn checks vs the checkpoint stack (odd leaves) -----------
        rho_all = s_cum_new[None, :, :] - rs_ck  # [K, C, d]
        dot_a = jnp.einsum("kcd,kcd->ck", rho_all, r_ck * inv_mass[None, None, :])
        vb = (r_new * inv_mass[None, :])[None, :, :]
        dot_b = jnp.einsum("kcd,kcd->ck", rho_all,
                           jnp.broadcast_to(vb, rho_all.shape))
        turn_all = jnp.logical_or(dot_a <= 0.0, dot_b <= 0.0)
        slot_ids = jnp.arange(kdim, dtype=jnp.int32)
        in_range = jnp.logical_and(
            slot_ids[None, :] >= (pc - t_ones)[:, None],
            slot_ids[None, :] < pc[:, None],
        )  # [C, K]
        turn_sub = jnp.any(jnp.logical_and(turn_all, in_range), axis=1)
        turn_sub = jnp.logical_and(turn_sub, jnp.logical_not(even))

        new_fail = live & (dvg | turn_sub)
        s_failed = jnp.logical_or(s_failed, new_fail)
        dvg_draw = jnp.logical_or(dvg_draw, live & dvg)

        upd = live & jnp.logical_not(new_fail)
        s_lw = jnp.where(upd, s_lw_new, s_lw)
        s_cum = jnp.where(upd[:, None], s_cum_new, s_cum)
        m_z = jnp.where(upd[:, None], z_new, m_z)
        m_r = jnp.where(upd[:, None], r_new, m_r)
        m_grad = jnp.where(upd[:, None], grad_new, m_grad)

        # --- subtree end: merge into the global tree ----------------------
        merging = jnp.logical_and(is_end, upd)
        p_take = jnp.exp(jnp.minimum(s_lw - lw, 0.0))
        take = jnp.logical_and(
            merging, jax.random.uniform(k_take, (c,)) < p_take
        )
        prop_z = jnp.where(take[:, None], sp_z, prop_z)
        prop_val = jnp.where(take, sp_val, prop_val)
        prop_grad = jnp.where(take[:, None], sp_grad, prop_grad)

        right_sel = jnp.logical_and(merging, take_right)
        left_sel = jnp.logical_and(merging, jnp.logical_not(take_right))
        right_z = jnp.where(right_sel[:, None], m_z, right_z)
        right_r = jnp.where(right_sel[:, None], m_r, right_r)
        right_grad = jnp.where(right_sel[:, None], m_grad, right_grad)
        left_z = jnp.where(left_sel[:, None], m_z, left_z)
        left_r = jnp.where(left_sel[:, None], m_r, left_r)
        left_grad = jnp.where(left_sel[:, None], m_grad, left_grad)

        r_sum = jnp.where(merging[:, None], r_sum + s_cum, r_sum)
        lw = jnp.where(merging, jnp.logaddexp(lw, s_lw), lw)

        full_turn = _turning(r_sum, left_r, right_r, inv_mass)

        active_new = active
        active_new = jnp.logical_and(active_new, jnp.logical_not(is_end & s_failed))
        active_new = jnp.logical_and(active_new, jnp.logical_not(new_fail))
        active_new = jnp.logical_and(active_new, jnp.logical_not(merging & full_turn))

        # stalled chains (n == 0, waiting on ring backpressure) are not
        # in a tree: they neither advance their leaf index nor finish
        in_tree = n > 0
        n_new = jnp.where(jnp.logical_and(working, in_tree), n + 1, n)
        budget_out = n_new >= max_n
        finished = jnp.logical_and(
            jnp.logical_and(working, in_tree),
            jnp.logical_or(jnp.logical_not(active_new), budget_out),
        )

        # --- write completed draws into the ring: static-slot selects -----
        # (no vector scatter, no dump row — each row is an elementwise
        # select on the per-chain mask "finished and this is my slot")
        acc_prob = sum_acc / jnp.maximum(cnt, 1.0)
        row_m = [finished & (s.draw % B == b) for b in range(B)]
        ring_z = jnp.stack([
            jnp.where(row_m[b][:, None], prop_z, s.ring_z[b])
            for b in range(B)
        ])
        ring_acc = jnp.stack([
            jnp.where(row_m[b], acc_prob, s.ring_acc[b]) for b in range(B)
        ])
        ring_dvg = jnp.stack([
            jnp.where(row_m[b], dvg_draw, s.ring_dvg[b]) for b in range(B)
        ])
        ring_cnt = jnp.stack([
            jnp.where(row_m[b], cnt, s.ring_cnt[b]) for b in range(B)
        ])

        draw = s.draw + finished.astype(jnp.int32)

        # --- flush: once EVERY chain has passed row `flushed`, that ring
        # slot is complete and no chain may touch it again (backpressure
        # above); move it to the output buffer at a shared scalar row —
        # dynamic_update_slice aliases in place.  The write is
        # unconditional (cheaper than predication): while incomplete it
        # lands partial data that the next flush attempt overwrites, and
        # `flushed` only advances when the row was complete.
        f = jnp.minimum(s.flushed, s_len - 1)
        slot = f % B
        zs_out = jax.lax.dynamic_update_slice(
            s.zs_out, jax.lax.dynamic_slice_in_dim(ring_z, slot, 1, 0),
            (f, 0, 0),
        )
        acc_out = jax.lax.dynamic_update_slice(
            s.acc_out, jax.lax.dynamic_slice_in_dim(ring_acc, slot, 1, 0),
            (f, 0),
        )
        dvg_out = jax.lax.dynamic_update_slice(
            s.dvg_out, jax.lax.dynamic_slice_in_dim(ring_dvg, slot, 1, 0),
            (f, 0),
        )
        cnt_out = jax.lax.dynamic_update_slice(
            s.cnt_out, jax.lax.dynamic_slice_in_dim(ring_cnt, slot, 1, 0),
            (f, 0),
        )
        flushed = s.flushed + (jnp.min(draw) > s.flushed).astype(jnp.int32)
        # finished chains adopt the accepted proposal and restart at n=0
        z_cur = jnp.where(finished[:, None], prop_z, s.z)
        val_cur = jnp.where(finished, prop_val, s.val)
        grad_cur = jnp.where(finished[:, None], prop_grad, s.grad)
        n_new = jnp.where(finished, 0, n_new)
        active_new = jnp.logical_and(active_new, jnp.logical_not(finished))

        return _PS(
            it=s.it + 1, draw=draw, n=n_new,
            z=z_cur, val=val_cur, grad=grad_cur, h0=h0,
            left_z=left_z, left_r=left_r, left_grad=left_grad,
            right_z=right_z, right_r=right_r, right_grad=right_grad,
            prop_z=prop_z, prop_val=prop_val, prop_grad=prop_grad,
            lw=lw, r_sum=r_sum,
            m_z=m_z, m_r=m_r, m_grad=m_grad,
            s_lw=s_lw, s_cum=s_cum,
            sp_z=sp_z, sp_val=sp_val, sp_grad=sp_grad,
            s_failed=s_failed,
            r_ck=r_ck, rs_ck=rs_ck,
            dirn=dirn, active=active_new, dvg_draw=dvg_draw,
            sum_acc=sum_acc, cnt=cnt,
            ring_z=ring_z, ring_acc=ring_acc, ring_dvg=ring_dvg,
            ring_cnt=ring_cnt, flushed=flushed,
            zs_out=zs_out, acc_out=acc_out, dvg_out=dvg_out, cnt_out=cnt_out,
        )

    s = jax.lax.while_loop(cond, body, s0)
    total_iters = s.it
    # at exit flushed >= s_len - 1: at most the LAST row is unflushed.
    # Rewriting it unconditionally is safe — no chain can have reused
    # slot (s_len-1) % B (that would need draw >= s_len - 1 + B).
    last_slot = (s_len - 1) % B
    zs_out = jax.lax.dynamic_update_slice(
        s.zs_out, s.ring_z[last_slot:last_slot + 1], (s_len - 1, 0, 0))
    acc_out = jax.lax.dynamic_update_slice(
        s.acc_out, s.ring_acc[last_slot:last_slot + 1], (s_len - 1, 0))
    dvg_out = jax.lax.dynamic_update_slice(
        s.dvg_out, s.ring_dvg[last_slot:last_slot + 1], (s_len - 1, 0))
    cnt_out = jax.lax.dynamic_update_slice(
        s.cnt_out, s.ring_cnt[last_slot:last_slot + 1], (s_len - 1, 0))
    return (
        jnp.swapaxes(zs_out, 0, 1),  # [C, S, d]
        jnp.swapaxes(acc_out, 0, 1),
        jnp.swapaxes(dvg_out, 0, 1),
        total_iters,
        jnp.mean(cnt_out, axis=1),  # [S] mean live leapfrogs/draw
    )


def nuts_batched(
    value_and_grad_fn: Callable[[Array], Tuple[Array, Array]],
    z0: Array,
    num_warmup: int,
    num_samples: int,
    key: Array,
    max_depth: int = 10,
    target_accept: float = 0.8,
    init_step_size: float = 0.1,
    max_delta_energy: float = 1000.0,
    axis_name=None,
    inv_mass0=None,
    chunk: int = 1,
    pipeline: bool = False,
    lookahead: int = 16,
) -> VectorizedNUTSResult:
    """Full vectorized-NUTS run with shared warmup adaptation."""
    c, d = z0.shape
    dtype = z0.dtype
    val0, grad0 = value_and_grad_fn(z0)
    in_slow, window_end = build_warmup_schedule(num_warmup)
    k_warm, k_samp = jax.random.split(key)

    def transition(z, val, grad, eps, inv_mass, k):
        return nuts_transition_batched(
            value_and_grad_fn, z, val, grad, eps, inv_mass, k,
            max_depth=max_depth, max_delta_energy=max_delta_energy,
            chunk=chunk,
        )

    def warmup_body(carry, xs):
        z, val, grad, da, s1, s2, n_acc, inv_mass, lf_total = carry
        k, slow, w_end = xs
        eps = jnp.exp(da.log_step)
        z, val, grad, ap, dvg, n_lf, _ = transition(z, val, grad, eps, inv_mass, k)
        lf_total = lf_total + n_lf
        da = da_update(da, _gmean(ap, axis_name), target_accept=target_accept)
        s1 = jnp.where(slow, s1 + jnp.sum(z, axis=0), s1)
        s2 = jnp.where(slow, s2 + jnp.sum(z * z, axis=0), s2)
        n_acc = jnp.where(slow, n_acc + c, n_acc)
        s1g, s2g, ng = _gsum(s1, axis_name), _gsum(s2, axis_name), _gsum(n_acc, axis_name)
        mean = s1g / jnp.maximum(ng, 1.0)
        var = s2g / jnp.maximum(ng, 1.0) - mean * mean
        n_acc_reg = ng
        var = (n_acc_reg / (n_acc_reg + 5.0)) * var + 1e-3 * (5.0 / (n_acc_reg + 5.0))
        inv_mass = jnp.where(w_end, var, inv_mass)
        s1 = jnp.where(w_end, jnp.zeros_like(s1), s1)
        s2 = jnp.where(w_end, jnp.zeros_like(s2), s2)
        n_acc = jnp.where(w_end, jnp.zeros_like(n_acc), n_acc)
        da = jax.tree_util.tree_map(
            lambda a, b: jnp.where(w_end, a, b), da_restart(da), da
        )
        return (z, val, grad, da, s1, s2, n_acc, inv_mass, lf_total), None

    da = da_init(jnp.asarray(init_step_size, dtype))
    inv_mass = jnp.ones((d,), dtype) if inv_mass0 is None else jnp.asarray(inv_mass0, dtype)
    carry = (z0, val0, grad0, da, jnp.zeros((d,), dtype), jnp.zeros((d,), dtype),
             jnp.zeros((), dtype), inv_mass, jnp.zeros((), jnp.int32))
    if num_warmup > 0:
        keys = jax.random.split(k_warm, num_warmup)
        with jax.named_scope("nuts_warmup"):
            carry, _ = jax.lax.scan(
                warmup_body, carry,
                (keys, jnp.asarray(in_slow), jnp.asarray(window_end)),
            )
    z, val, grad, da, _, _, _, inv_mass, warmup_leapfrog = carry
    eps_final = (
        jnp.exp(da.log_step_avg) if num_warmup > 0
        else jnp.asarray(init_step_size, dtype)
    )

    if pipeline:
        with jax.named_scope("nuts_sampling_pipelined"):
            zs_cs, aps_cs, dvgs_cs, total_iters, c_leaps = _pipelined_sampling(
                value_and_grad_fn, z, val, grad, eps_final, inv_mass,
                k_samp, num_samples, max_depth, max_delta_energy,
                lookahead=lookahead,
            )
        # per-draw loop-iteration counts have no lockstep meaning here;
        # report the amortized iterations/draw so FLOP accounting
        # (sum over draws) still totals the executed iterations
        n_leaps = jnp.full(
            (num_samples,),
            (total_iters + num_samples - 1) // num_samples, jnp.int32,
        )
        return VectorizedNUTSResult(
            samples=zs_cs, accept_prob=aps_cs, diverging=dvgs_cs,
            num_leapfrog=n_leaps, step_size=eps_final, inv_mass=inv_mass,
            warmup_leapfrog=warmup_leapfrog, chain_leapfrog=c_leaps,
        )

    def sample_body(carry, k):
        z, val, grad = carry
        z, val, grad, ap, dvg, n_leaps, c_leaps = transition(
            z, val, grad, eps_final, inv_mass, k)
        return (z, val, grad), (z, ap, dvg, n_leaps, c_leaps)

    keys = jax.random.split(k_samp, num_samples)
    with jax.named_scope("nuts_sampling"):
        _, (zs, aps, dvgs, n_leaps, c_leaps) = jax.lax.scan(
            sample_body, (z, val, grad), keys)
    return VectorizedNUTSResult(
        samples=jnp.swapaxes(zs, 0, 1),
        accept_prob=jnp.swapaxes(aps, 0, 1),
        diverging=jnp.swapaxes(dvgs, 0, 1),
        num_leapfrog=n_leaps,
        step_size=eps_final,
        inv_mass=inv_mass,
        warmup_leapfrog=warmup_leapfrog,
        chain_leapfrog=c_leaps,
    )
