"""Streaming / online SMC (ROADMAP #8; VERDICT r2 missing #5).

Unbounded time series in O(lag + chunk) device memory: the filter
consumes observations in fixed-size chunks — ONE compiled ``lax.scan``
per chunk, the same program reused for every chunk (the trailing partial
chunk is padded and masked, so nothing ever recompiles) — carrying only
particles, weights, the running log-marginal and a fixed-lag ancestry
RING BUFFER.  No reference counterpart (Brancher has no SMC at all;
SURVEY.md §0): capability and design are TPU-first.

Fixed-lag smoothing: E[x_s | y_{1:s+L}] is approximated by the weighted
mean of the time-s states of the CURRENT particles' ancestral lines (the
standard fixed-lag approximation, Kitagawa 1996): the buffer holds the
last ``lag`` states per particle, re-indexed by every resampling
selection.  Ancestry trimming is implicit — once a time falls out of the
window its estimate is emitted and its states discarded, so memory never
grows with T.  For state-space models with geometric mixing the
approximation error decays exponentially in ``lag``.

The scan body is straight-line (branch-free selects; the padding mask
gates increments), algorithmically identical to the batch filter in
smc.py — filter means and log-marginals agree with the batch filter
within Monte-Carlo error at any prefix (tests/test_smc.py).

Sharded mode (ROADMAP r3 #5): pass ``mesh=`` to shard the particle axis
over a pod slice while streaming — unbounded series at P particles on
n_dev chips in O(lag + chunk) memory PER DEVICE.  Resampling is the
exact global systematic draw (only the O(P) weight vector is gathered);
ancestor STATE and each particle's fixed-lag ancestry line move
point-to-point together through ONE ``ring_exchange`` pass (the [lag+1]
states per particle ride the same ppermute rounds), and only on steps
where the adaptive trigger fires.  Reductions (log-marginal, ESS,
filter/smoothed means) are O(1)/O(d) psums.  The resampling key is
replicated so every shard draws the identical global CDF positions.
"""
from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .smc import StateSpace, _ess, systematic_resample_indices

Array = jax.Array


class StreamingState(NamedTuple):
    """Constant-size carry between chunks (device-resident).

    The stream RNG key is part of the carry (VERDICT r3 weak #6):
    checkpointing this tuple and resuming in a fresh process reproduces
    the uninterrupted filter bit-for-bit — no mutable RNG hides on the
    StreamingSMC object."""

    t: Array  # int32 — next global step index
    x: Array  # [P, ...] current particles
    lw: Array  # [P] unnormalized log-weights
    log_ml: Array  # running log p(y_{0:t-1}) estimate
    lag_buf: Array  # [L, P, ...] ring buffer of ancestral states
    key: Array  # PRNG key driving all future chunks (replicated)


class StreamingResult(NamedTuple):
    log_marginal: Array
    filter_means: np.ndarray  # [T, ...] E[x_t | y_{0:t}]
    smoothed_means: np.ndarray  # [T, ...] E[x_t | y_{0:min(t+L, T-1)}]
    ess_history: np.ndarray  # [T]


class StreamingSMC:
    """Online bootstrap particle filter with fixed-lag smoothing.

    Usage (true streaming; memory independent of total length)::

        f = StreamingSMC(ssm, num_particles=1024, lag=16)
        state = f.init(y0, key)
        for chunk in source:                      # any number of chunks
            state, out = f.process(state, chunk)  # out: per-step means
        tail = f.finalize(state)                  # last `lag` smoothed

    ``process`` accepts chunks of any length; internally they are padded
    to ``chunk_size`` so a single compiled program serves every call.
    """

    def __init__(
        self,
        ssm: StateSpace,
        num_particles: int = 1024,
        lag: int = 16,
        chunk_size: int = 256,
        ess_threshold: float = 0.5,
        mesh=None,
        particle_axis: str = "particle",
    ):
        self.ssm = ssm
        self.num_particles = int(num_particles)
        self.lag = int(lag)
        self.chunk_size = int(chunk_size)
        self.ess_threshold = float(ess_threshold)
        self.mesh = mesh
        self.particle_axis = particle_axis
        if mesh is None:
            self._process_jit = jax.jit(self._process_impl)
            self._init_jit = jax.jit(self._init_impl)
            self._finalize_jit = jax.jit(self._finalize_impl)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            n_dev = mesh.shape[particle_axis]
            if self.num_particles % n_dev != 0:
                raise ValueError(
                    f"num_particles={num_particles} must divide over mesh "
                    f"axis {particle_axis!r} of size {n_dev}"
                )
            ax = particle_axis
            state_spec = StreamingState(
                t=P(), x=P(ax), lw=P(ax), log_ml=P(), lag_buf=P(None, ax),
                key=P(),
            )
            self._process_jit = jax.jit(shard_map(
                self._process_sharded, mesh=mesh,
                in_specs=(state_spec, P(), P()),
                out_specs=(state_spec, (P(), P(), P(), P())),
                check_vma=False,
            ))
            self._init_jit = jax.jit(shard_map(
                self._init_sharded, mesh=mesh,
                in_specs=(P(), P()),
                out_specs=(state_spec, P(), P()),
                check_vma=False,
            ))
            self._finalize_jit = jax.jit(shard_map(
                self._finalize_sharded, mesh=mesh,
                in_specs=(state_spec,),
                out_specs=(P(), P()),
                check_vma=False,
            ))

    # -- jitted kernels -------------------------------------------------
    def _init_impl(self, y0, key):
        p = self.num_particles
        key, k_stream = jax.random.split(key)
        x0 = jax.vmap(self.ssm.init_sample)(jax.random.split(key, p))
        lw0 = jax.vmap(lambda x: self.ssm.obs_log_prob(y0, x, 0))(x0)
        log_ml0 = jax.scipy.special.logsumexp(lw0) - jnp.log(float(p))
        buf = jnp.broadcast_to(x0[None], (self.lag,) + x0.shape)
        # slot 0 holds time 0; the other slots are placeholders that are
        # overwritten before any estimate is emitted from them
        w0 = jax.nn.softmax(lw0)
        mean0 = jnp.tensordot(w0, x0, axes=(0, 0))
        state = StreamingState(
            jnp.asarray(1, jnp.int32), x0, lw0, log_ml0, buf, k_stream
        )
        return state, mean0, _ess(lw0)

    def _process_impl(self, state: StreamingState, ys, valid):
        p, lag = self.num_particles, self.lag
        ssm, thresh = self.ssm, self.ess_threshold
        iota = jnp.arange(p)

        def step(carry, inp):
            x, lw, log_ml, buf, t = carry
            y_t, ok, k_t = inp
            k_res, k_prop = jax.random.split(k_t)

            ess = _ess(lw)
            do_resample = jnp.logical_and(ess < thresh * p, ok)
            idx = systematic_resample_indices(k_res, lw)
            sel = jnp.where(do_resample, idx, iota)
            x = jnp.take(x, sel, axis=0)
            buf = jnp.take(buf, sel, axis=1)  # re-index ancestral lines
            lse = jax.scipy.special.logsumexp(lw)
            lw = jnp.where(
                do_resample, jnp.zeros_like(lw), lw - lse + jnp.log(float(p))
            )

            keys = jax.random.split(k_prop, p)
            x_prop = jax.vmap(lambda kk, xx: ssm.trans_sample(kk, xx, t))(keys, x)
            x_new = jnp.where(ok, x_prop, x)  # padded steps do not advance
            l_obs = jax.vmap(lambda xx: ssm.obs_log_prob(y_t, xx, t))(x_new)
            lw_new = jnp.where(ok, lw + l_obs, lw)

            inc = (
                jax.scipy.special.logsumexp(lw_new)
                - jax.scipy.special.logsumexp(lw)
            )
            log_ml = log_ml + jnp.where(ok, inc, 0.0)

            w = jax.nn.softmax(lw_new)
            mean_t = jnp.tensordot(w, x_new, axes=(0, 0))
            # slot t % L currently holds time t - L: emit its lag-L
            # smoothed estimate under the CURRENT posterior weights,
            # then overwrite it with time t (implicit ancestry trimming)
            slot = jnp.mod(t, lag)
            old = jax.lax.dynamic_index_in_dim(buf, slot, 0, keepdims=False)
            sm_mean = jnp.tensordot(w, old, axes=(0, 0))
            buf = jax.lax.dynamic_update_index_in_dim(buf, x_new, slot, 0)

            t_next = jnp.where(ok, t + 1, t)
            return (x_new, lw_new, log_ml, buf, t_next), (
                mean_t, sm_mean, t - lag, _ess(lw_new)
            )

        k_chunk, k_next = jax.random.split(state.key)
        keys = jax.random.split(k_chunk, ys.shape[0])
        (x, lw, log_ml, buf, t), (means, sm_means, sm_times, esss) = jax.lax.scan(
            step, (state.x, state.lw, state.log_ml, state.lag_buf, state.t),
            (ys, valid, keys),
        )
        new_state = StreamingState(t, x, lw, log_ml, buf, k_next)
        return new_state, (means, sm_means, sm_times, esss)

    def _finalize_impl(self, state: StreamingState):
        """Smoothed estimates for the last min(lag, t) times still in the
        buffer, under the final weights; returned oldest-first with their
        global time indices."""
        lag = self.lag
        w = jax.nn.softmax(state.lw)
        # slot (t - lag + j) % lag holds time t - lag + j, j = 0..lag-1
        js = jnp.arange(lag)
        slots = jnp.mod(state.t - lag + js, lag)
        rows = jnp.take(state.lag_buf, slots, axis=0)  # [lag, P, ...]
        sm = jnp.tensordot(rows, w, axes=(1, 0))  # [lag, ...]
        times = state.t - lag + js
        return sm, times

    # -- sharded kernels (particle axis over a mesh; ROADMAP r3 #5) ----
    def _init_sharded(self, y0, key):
        from ..ops.resampling import distributed_logsumexp

        ax = self.particle_axis
        n_dev = jax.lax.axis_size(ax)
        local_p = self.num_particles // n_dev
        my = jax.lax.axis_index(ax)
        key, k_stream = jax.random.split(key)
        keys = jax.random.split(jax.random.fold_in(key, my), local_p)
        x0 = jax.vmap(self.ssm.init_sample)(keys)
        lw0 = jax.vmap(lambda x: self.ssm.obs_log_prob(y0, x, 0))(x0)
        lse = distributed_logsumexp(lw0, ax)
        log_ml0 = lse - jnp.log(float(self.num_particles))
        buf = jnp.broadcast_to(x0[None], (self.lag,) + x0.shape)
        w0 = jnp.exp(lw0 - lse)
        mean0 = jax.lax.psum(jnp.tensordot(w0, x0, axes=(0, 0)), ax)
        ess0 = 1.0 / jax.lax.psum(jnp.sum(w0 * w0), ax)
        state = StreamingState(
            jnp.asarray(1, jnp.int32), x0, lw0, log_ml0, buf, k_stream
        )
        return state, mean0, ess0

    def _process_sharded(self, state: StreamingState, ys, valid):
        from ..ops.resampling import distributed_logsumexp, ring_exchange

        p, lag, ax = self.num_particles, self.lag, self.particle_axis
        ssm, thresh = self.ssm, self.ess_threshold
        n_dev = jax.lax.axis_size(ax)
        local_p = p // n_dev
        my = jax.lax.axis_index(ax)
        iota_g = my * local_p + jnp.arange(local_p)

        def step(carry, inp):
            x, lw, log_ml, buf, t = carry
            y_t, ok, k_t = inp
            k_res, k_prop = jax.random.split(k_t)

            # weights only (O(P)): the global systematic CDF; the
            # resampling key is replicated so every shard draws the
            # identical positions (CLAUDE.md regression lesson)
            lw_all = jax.lax.all_gather(lw, ax).reshape(-1)
            ess = _ess(lw_all)
            do_resample = jnp.logical_and(ess < thresh * p, ok)
            idx_global = systematic_resample_indices(k_res, lw_all)
            my_idx = jax.lax.dynamic_slice_in_dim(
                idx_global, my * local_p, local_p
            )

            def do_exchange(args):
                x, buf = args
                # each particle's fixed-lag ancestry line moves WITH it:
                # one ring pass over [local_p, lag+1, ...] stacked states
                stacked = jnp.concatenate(
                    [x[:, None], jnp.moveaxis(buf, 0, 1)], axis=1
                )
                out = ring_exchange(stacked, my_idx, ax)
                return out[:, 0], jnp.moveaxis(out[:, 1:], 1, 0)

            x, buf = jax.lax.cond(
                do_resample, do_exchange, lambda a: a, (x, buf)
            )
            lse = distributed_logsumexp(lw, ax)
            lw = jnp.where(
                do_resample, jnp.zeros_like(lw), lw - lse + jnp.log(float(p))
            )

            keys = jax.vmap(lambda i: jax.random.fold_in(k_prop, i))(iota_g)
            x_prop = jax.vmap(lambda kk, xx: ssm.trans_sample(kk, xx, t))(keys, x)
            x_new = jnp.where(ok, x_prop, x)
            l_obs = jax.vmap(lambda xx: ssm.obs_log_prob(y_t, xx, t))(x_new)
            lw_new = jnp.where(ok, lw + l_obs, lw)

            lse_new = distributed_logsumexp(lw_new, ax)
            inc = lse_new - distributed_logsumexp(lw, ax)
            log_ml = log_ml + jnp.where(ok, inc, 0.0)

            w = jnp.exp(lw_new - lse_new)
            mean_t = jax.lax.psum(jnp.tensordot(w, x_new, axes=(0, 0)), ax)
            slot = jnp.mod(t, lag)
            old = jax.lax.dynamic_index_in_dim(buf, slot, 0, keepdims=False)
            sm_mean = jax.lax.psum(jnp.tensordot(w, old, axes=(0, 0)), ax)
            buf = jax.lax.dynamic_update_index_in_dim(buf, x_new, slot, 0)
            ess_new = 1.0 / jax.lax.psum(jnp.sum(w * w), ax)

            t_next = jnp.where(ok, t + 1, t)
            return (x_new, lw_new, log_ml, buf, t_next), (
                mean_t, sm_mean, t - lag, ess_new
            )

        # state.key is replicated: every shard advances the identical
        # stream, so resampling keys stay shard-identical (CLAUDE.md
        # regression lesson) and a checkpointed state resumes exactly
        k_chunk, k_next = jax.random.split(state.key)
        keys = jax.random.split(k_chunk, ys.shape[0])
        (x, lw, log_ml, buf, t), (means, sm_means, sm_times, esss) = jax.lax.scan(
            step, (state.x, state.lw, state.log_ml, state.lag_buf, state.t),
            (ys, valid, keys),
        )
        new_state = StreamingState(t, x, lw, log_ml, buf, k_next)
        return new_state, (means, sm_means, sm_times, esss)

    def _finalize_sharded(self, state: StreamingState):
        from ..ops.resampling import distributed_logsumexp

        lag, ax = self.lag, self.particle_axis
        lse = distributed_logsumexp(state.lw, ax)
        w = jnp.exp(state.lw - lse)
        js = jnp.arange(lag)
        slots = jnp.mod(state.t - lag + js, lag)
        rows = jnp.take(state.lag_buf, slots, axis=0)  # [lag, P_local, ...]
        sm = jax.lax.psum(jnp.tensordot(rows, w, axes=(1, 0)), ax)
        times = state.t - lag + js
        return sm, times

    # -- public API -----------------------------------------------------
    def init(self, y0, key: Optional[Array] = None):
        """Consume the first observation; returns (state, out) where out
        holds (filter_mean_0, ess_0).  The returned state carries the
        whole stream's RNG: checkpoint it (it is a flat NamedTuple of
        arrays) and a resumed run reproduces the uninterrupted filter
        bit-for-bit (tests/test_smc.py)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        state, mean0, ess0 = self._init_jit(jnp.asarray(y0), key)
        return state, (mean0, ess0)

    def process(self, state: StreamingState, ys_chunk):
        """Consume a chunk (any length <= chunk_size; longer chunks are
        split).  Returns (state, (filter_means, smoothed_means,
        smoothed_times, ess)) with one row per observation; smoothed
        rows with time < 0 are warm-up placeholders."""
        ys_chunk = jnp.asarray(ys_chunk)
        n = ys_chunk.shape[0]
        outs = []
        for start in range(0, n, self.chunk_size):
            part = ys_chunk[start : start + self.chunk_size]
            m = part.shape[0]
            pad = self.chunk_size - m
            if pad:
                part = jnp.concatenate(
                    [part, jnp.zeros((pad,) + part.shape[1:], part.dtype)]
                )
            valid = (jnp.arange(self.chunk_size) < m)
            state, (means, sms, smt, esss) = self._process_jit(
                state, part, valid
            )
            outs.append((means[:m], sms[:m], smt[:m], esss[:m]))
        cat = lambda i: jnp.concatenate([o[i] for o in outs], axis=0)
        return state, (cat(0), cat(1), cat(2), cat(3))

    def finalize(self, state: StreamingState):
        """(smoothed_means [<=lag, ...], times) for the still-buffered
        tail under the final posterior weights."""
        sm, times = self._finalize_jit(state)
        keep = np.asarray(times) >= 0
        return np.asarray(sm)[keep], np.asarray(times)[keep]


def streaming_particle_filter(
    ssm: StateSpace,
    ys,
    num_particles: int = 1024,
    key: Optional[Array] = None,
    lag: int = 16,
    chunk_size: int = 256,
    ess_threshold: float = 0.5,
    mesh=None,
    particle_axis: str = "particle",
) -> StreamingResult:
    """Convenience driver: filter a full array through the streaming
    engine (device memory stays O(lag + chunk) regardless of T) and
    assemble per-step filter/smoothed means on the host.  With ``mesh=``
    the particle axis shards over the mesh (ring-exchange resampling;
    see the module docstring)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    ys = np.asarray(ys)
    t_len = ys.shape[0]
    ev_shape = None

    f = StreamingSMC(ssm, num_particles, lag, chunk_size, ess_threshold,
                     mesh=mesh, particle_axis=particle_axis)
    state, (mean0, ess0) = f.init(ys[0], key)
    ev_shape = np.asarray(mean0).shape
    filter_means = np.zeros((t_len,) + ev_shape, np.float64)
    smoothed = np.zeros((t_len,) + ev_shape, np.float64)
    ess_hist = np.zeros((t_len,), np.float64)
    filter_means[0] = np.asarray(mean0)
    ess_hist[0] = float(ess0)

    pos = 1
    while pos < t_len:
        chunk = ys[pos : pos + chunk_size]
        state, (means, sms, smt, esss) = f.process(state, chunk)
        m = chunk.shape[0]
        filter_means[pos : pos + m] = np.asarray(means)
        ess_hist[pos : pos + m] = np.asarray(esss)
        smt_np = np.asarray(smt)
        keep = smt_np >= 0
        smoothed[smt_np[keep]] = np.asarray(sms)[keep]
        pos += m
    sm_tail, tail_times = f.finalize(state)
    smoothed[tail_times] = sm_tail
    return StreamingResult(
        state.log_ml, filter_means, smoothed, ess_hist
    )
