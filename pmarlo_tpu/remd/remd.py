"""Replica-exchange MD: all replicas as one batched tensor program.

Rebuild of the removed ``pmarlo.replica_exchange`` subsystem from its
documented contract (reference CHANGELOG.md:22,80,126-127,291,614 —
ReplicaExchange/run_replica_exchange/RemdConfig, exchange attempts every
100 steps, velocity rescaling on swap, gradual heating + temperature
equilibration phases, demux by temperature), redesigned TPU-first:

- Replicas are a leading batch axis; the MD step is ``vmap``-ed and the
  whole (steps + exchanges) loop is ONE ``lax.scan`` — no host round-trips
  per exchange (the reference crossed Python<->OpenMM every segment,
  SURVEY.md section 3.2).
- State is **rung-major**: array slot r always holds the configuration
  currently simulating at temperature ``ladder[r]``. Swaps move
  configurations between rungs, so per-rung trajectories are demuxed
  *by construction*; the replica-identity permutation history is recorded
  so per-replica (continuous-configuration) trajectories can be
  reconstructed — the inverse view of the reference's demux
  (CHANGELOG.md:633).
- Exchange = parity-alternating neighbor Metropolis over beta-differences,
  computed as pure array ops (partner gathers + where): on a sharded
  replica axis XLA lowers the neighbor access to ICI collective-permutes.
- Velocities are rescaled by sqrt(T_new/T_old) on accepted swaps
  (CHANGELOG.md:211's numpy-view hot path becomes a fused multiply).

Sharding: pass ``mesh=`` to ``ReplicaExchange`` to place the replica axis
on a device mesh; everything inside the scan is then SPMD over ICI.
``use_pallas=True`` swaps the MD chunks for the fused kernel
(md/pallas_md.py), and ``run_fused`` executes entire runs — including the
swap logic — in one kernel launch.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    BOLTZMANN_CONSTANT_KJ_PER_MOL,
    DEFAULT_FRICTION_PER_PS,
    DEFAULT_TIMESTEP_PS,
    REMD_DEFAULT_EXCHANGE_FREQUENCY,
)
from ..md.forces import potential_energy
from ..md.integrate import (
    MDState,
    initialize_velocities,
    langevin_step,
    remove_com_motion,
)
from ..md.minimize import minimize_energy
from ..md.system import System
from ..utils.input_parsing import parse_temperature_ladder


@dataclasses.dataclass(frozen=True)
class RemdConfig:
    """(reference CHANGELOG.md:126 RemdConfig)."""

    temperatures: Tuple[float, ...] = ()
    n_replicas: int = 32
    t_min: float = 300.0
    t_max: float = 450.0
    exchange_frequency: int = REMD_DEFAULT_EXCHANGE_FREQUENCY
    #: attempts per compiled scan block. Larger blocks amortize the
    #: per-dispatch latency (significant on tunneled devices) at the cost
    #: of a longer one-time compile; runs whose attempt count is a multiple
    #: of the block reuse a single executable regardless of n_steps.
    attempts_per_block: int = 100
    #: cap on asynchronously queued blocks before ``run`` synchronizes on
    #: the newest one. Async dispatch pipelines blocks so the tunnel
    #: round-trip is paid once, but an UNBOUNDED queue makes the final
    #: gather wait for the whole run in one blocking RPC — long
    #: production runs (e.g. 500 attempts x 12 protein replicas, ~25 min
    #: of device work) exceeded the axon tunnel's deadline and took the
    #: TPU worker down. Syncing every couple of blocks bounds any single
    #: wait at ~2 block walls while losing only the dispatch latency
    #: (~100 ms) per sync.
    max_async_blocks: int = 2
    dt_ps: float = DEFAULT_TIMESTEP_PS
    friction_per_ps: float = DEFAULT_FRICTION_PER_PS
    heating_steps: int = 0          # linear ramp T_min -> ladder (CHANGELOG:291)
    equilibration_steps: int = 0    # no-exchange phase at target temperatures
    report_interval: int = 100
    #: dtype of the transferred frame positions: "f32" (exact) or "i16"
    #: (XTC-style fixed point, 1e-3 nm resolution — the precision GROMACS
    #: trajectories ship at). Quantization runs on device, HALVING the
    #: device->host bytes; the frames are dequantized to float on the
    #: host. Valid while |coordinate| < 32.7 nm (int16 range at 1e-3 nm);
    #: the block program poisons out-of-range values to INT16_MIN, which
    #: dequantizes to -32.768 nm — far outside any such box — rather
    #: than silently wrapping. Applies to the scan-block path (``run``);
    #: the fused single-kernel path always ships f32.
    frame_precision: str = "f32"
    seed: int = 2024

    def ladder(self) -> np.ndarray:
        if self.temperatures:
            return np.asarray(parse_temperature_ladder(list(self.temperatures)))
        return np.asarray(
            parse_temperature_ladder(f"{self.t_min}:{self.t_max}:{self.n_replicas}")
        )

    def __post_init__(self):
        if self.exchange_frequency < 1:
            raise ValueError("exchange_frequency must be >= 1")
        if self.exchange_frequency % self.report_interval != 0:
            raise ValueError(
                "report_interval must divide exchange_frequency "
                f"(got {self.report_interval} vs {self.exchange_frequency})"
            )
        if self.frame_precision not in ("f32", "i16"):
            raise ValueError(
                f"frame_precision must be f32|i16, got {self.frame_precision!r}"
            )


@dataclasses.dataclass
class RemdResult:
    """Device/host outputs of one REMD run."""

    positions: np.ndarray          # (F, R, N, 3) rung-major (demuxed) frames
    potential_energy: np.ndarray   # (F, R)
    temperatures: np.ndarray       # (R,) ladder
    replica_ids: np.ndarray        # (A+1, R) configuration identity per rung
    acceptance_matrix: np.ndarray  # (R-1,) per-neighbor-pair acceptance rate
    exchange_attempts: int
    n_steps: int
    dt_ps: float
    #: frames recorded per exchange attempt — exact, set by the producing
    #: run (RemdConfig enforces report_interval | exchange_frequency, so
    #: this is a constant). 0 means "unknown" (legacy results): fall back
    #: to the n_frames // n_attempts estimate.
    frames_per_attempt: int = 0

    @property
    def mean_acceptance(self) -> float:
        return float(np.nanmean(self.acceptance_matrix))

    def demuxed_trajectory(self, rung: int) -> np.ndarray:
        """Constant-temperature trajectory at ladder[rung] — rung-major
        recording makes this a plain slice (demux by construction)."""
        return self.positions[:, rung]

    def replica_trajectory(self, replica: int) -> np.ndarray:
        """Continuous-configuration trajectory of one walker, reconstructed
        from the identity history (the reference's pre-demux view)."""
        n_attempts = self.replica_ids.shape[0] - 1
        n_frames = self.positions.shape[0]
        fpc = self.frames_per_attempt
        if fpc <= 0:  # legacy fallback
            fpc = max(n_frames // max(n_attempts, 1), 1)
        frames = []
        for f in range(n_frames):
            # frames of attempt-chunk a are recorded BEFORE that chunk's
            # closing swap, so the identity map is replica_ids[a]
            a = min(f // fpc, n_attempts - 1) if n_attempts > 0 else 0
            rung = int(np.where(self.replica_ids[a] == replica)[0][0])
            frames.append(self.positions[f, rung])
        return np.asarray(frames)


# single source for the force/bias composition rule (run_segment uses
# the same one — the two entry points must not drift)
from ..md.setup import compose_bias as _compose_bias  # noqa: E402


class ReplicaExchange:
    """REMD driver (reference CHANGELOG.md:22 ReplicaExchange).

    Usage::

        remd = ReplicaExchange(system, positions, RemdConfig(n_replicas=32))
        result = remd.run(n_steps=100_000)
    """

    def __init__(
        self,
        system: System,
        positions: jax.Array,
        config: RemdConfig,
        *,
        bias_fn: Optional[Callable] = None,
        minimize: bool = True,
        mesh: Optional[jax.sharding.Mesh] = None,
        use_pallas: bool = False,
        pallas_bias: Optional[Dict] = None,
        force_fn: Optional[Callable] = None,
        constraints=None,
    ):
        """``pallas_bias`` runs a DeepTICA harmonic-expansion CV bias INSIDE
        the fused kernel: {"model": DeepTICAModel (tanh MLP on cos/sin
        dihedral features), "quads": (M, 4) dihedral atom indices,
        "strength": float}. For arbitrary python bias functions use the XLA
        path (``bias_fn``).

        ``force_fn`` overrides the per-replica force evaluation
        (``fn(x (N,3)) -> (energy, forces)``): pass
        ``md.pallas_pair.build_pair_force_fn(system)`` to run
        protein-scale REMD, or ``md.pallas_cells.build_cell_force_fn``
        for explicit-solvent REMD at scale — both kernels batch over
        replicas via the pallas vmap rule. ``constraints`` (a spec from
        ``md.constraints.build_h_constraints``) enables SHAKE/RATTLE in
        every replica's integrator (rigid water at 2 fs)."""
        self.system = system
        self.config = config
        self.bias_fn = bias_fn
        self.mesh = mesh
        self.ladder = jnp.asarray(config.ladder(), dtype=positions.dtype)
        self.n_replicas = int(self.ladder.shape[0])
        from ..md.integrate import make_force_fn

        if force_fn is not None and use_pallas:
            raise ValueError("force_fn override and use_pallas are exclusive")
        if force_fn is not None and bias_fn is not None:
            # compose the bias into the override — storing the override
            # unmodified would run completely UNBIASED dynamics while the
            # caller believes the bias is active (the same silent-unbiased
            # class as the round-1 pallas_bias regression below); wrap the
            # batched/stateful entries too so the cell kernel's
            # skin-amortized path stays biased
            force_fn = _compose_bias(force_fn, bias_fn)
        # recorded in checkpoints so resume validates the same force path
        self._force_fn_is_override = force_fn is not None
        self._force_fn = force_fn or make_force_fn(system, bias_fn, analytic=True)
        self._constraints = constraints
        if constraints is not None and use_pallas:
            raise ValueError(
                "constraints are integrated in the XLA path; the fused "
                "pallas chunk does not SHAKE (use use_pallas=False)"
            )
        self._jit_cache: Dict = {}
        if use_pallas and bias_fn is not None:
            raise ValueError(
                "use_pallas=True takes the structured pallas_bias (in-kernel "
                "DeepTICA bias), not an arbitrary bias_fn; use the XLA path "
                "for python bias functions"
            )
        if pallas_bias is not None and not use_pallas:
            raise ValueError("pallas_bias requires use_pallas=True")
        if use_pallas and mesh is not None:
            raise ValueError("use_pallas=True is single-chip only for now")
        self.use_pallas = use_pallas
        # run_fused() reads this to wire the in-kernel CV bias; it MUST be
        # assigned whenever pallas_bias is given (round-1 regression: the
        # ctor only fed build_pallas_chunk, so biased run_fused silently
        # produced unbiased trajectories)
        self._pallas_bias = pallas_bias
        if use_pallas:
            # chunks must be BUILT eagerly: construction converts system
            # parameter arrays with numpy, which is illegal inside the
            # production scan's trace
            from ..md.pallas_md import build_pallas_chunk

            sizes = {config.report_interval}
            if config.equilibration_steps > 0:
                sizes.add(config.equilibration_steps)
            if config.heating_steps > 0:
                sizes.add(max(config.heating_steps // 10, 1))
            bias_kwargs = {}
            if pallas_bias is not None:
                bias_kwargs = dict(
                    bias_model=pallas_bias["model"],
                    bias_quads=pallas_bias["quads"],
                    bias_strength=pallas_bias.get("strength", 1.0),
                )
            for n in sizes:
                self._jit_cache[("pallas", n)] = build_pallas_chunk(
                    system,
                    dt=config.dt_ps,
                    friction=config.friction_per_ps,
                    n_steps=n,
                    n_replicas=self.n_replicas,
                    **bias_kwargs,
                )

        key = jax.random.PRNGKey(config.seed)
        if minimize:
            positions, _ = minimize_energy(system, positions, bias_fn=bias_fn)
        # replicate initial configuration across rungs
        x0 = jnp.broadcast_to(
            positions[None], (self.n_replicas,) + positions.shape
        )
        keys = jax.random.split(key, self.n_replicas + 1)
        v0 = jax.vmap(
            lambda k, T: remove_com_motion(
                system, initialize_velocities(system, k, T)
            )
        )(keys[1:], self.ladder)
        self._swap_key = keys[0]
        self.state = MDState(
            positions=self._shard(x0),
            velocities=self._shard(v0),
            key=self._shard(jax.vmap(jax.random.fold_in, (None, 0))(
                keys[0], jnp.arange(self.n_replicas)
            )),
            step=jnp.zeros(self.n_replicas, dtype=jnp.int32),
        )
        self.replica_ids = jnp.arange(self.n_replicas, dtype=jnp.int32)

    def _shard(self, arr: jax.Array) -> jax.Array:
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P("replica", *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    # --- jitted phases --------------------------------------------------------

    def _md_chunk(self, state: MDState, temps: jax.Array, n_steps: int):
        """vmapped Langevin chunk at per-replica temperatures."""
        if self.use_pallas:
            return self._md_chunk_pallas(state, temps, n_steps)
        dt, friction = self.config.dt_ps, self.config.friction_per_ps
        system, force_fn = self.system, self._force_fn

        constraints = self._constraints
        # cell-kernel skin amortization over the replica axis: the force
        # is evaluated ONCE per step for all replicas through
        # apply_batched (rebin cond hoisted outside the vmap) and handed
        # to each replica's integrator as a precomputed (E, F) pair —
        # langevin_step evaluates its force_fn exactly once, at the
        # pre-step positions, so the closure is exact
        batched = getattr(force_fn, "apply_batched", None)

        if batched is not None:
            def one_step(carry, _):
                states, fstate = carry
                e_b, f_b, fstate = batched(states.positions, fstate)

                def step_single(st, T, ei, fi):
                    return langevin_step(
                        system, st, dt=dt, friction=friction,
                        temperature_K=T,
                        force_fn=lambda _x: (ei, fi),
                        constraints=constraints,
                    )
                new_states, energy = jax.vmap(step_single)(
                    states, temps, e_b, f_b
                )
                return (new_states, fstate), energy

            fstate0 = force_fn.init_state_batched(state.positions)
            (state, _), _ = jax.lax.scan(
                one_step, (state, fstate0), None, length=n_steps
            )
        else:
            def one_step(carry, _):
                def step_single(st, T):
                    return langevin_step(
                        system, st, dt=dt, friction=friction,
                        temperature_K=T, force_fn=force_fn,
                        constraints=constraints,
                    )
                new_state, energy = jax.vmap(step_single)(carry, temps)
                return new_state, energy

            state, _ = jax.lax.scan(one_step, state, None, length=n_steps)
        # Metropolis needs the potential at the CURRENT (post-chunk)
        # configurations; langevin_step reports pre-step energies, so
        # re-evaluate at the final positions (one extra force eval per
        # exchange window — negligible, and it matches the Pallas path)
        energies = jax.vmap(lambda x: force_fn(x)[0])(state.positions)
        return state, energies

    def _md_chunk_pallas(self, state: MDState, temps: jax.Array, n_steps: int):
        """Fused-kernel chunk: one pallas_call advances all replicas
        n_steps (md/pallas_md.py). Noise comes from the on-core PRNG,
        seeded from the (folded) state keys each chunk."""
        key = ("pallas", n_steps)
        if key not in self._jit_cache:
            raise RuntimeError(
                f"no prebuilt pallas chunk for n_steps={n_steps}; chunk sizes "
                "are fixed by RemdConfig at construction (report_interval/"
                "equilibration/heating)"
            )
        seeds = state.key.reshape(self.n_replicas, -1)[:, 0].astype(jnp.int32)
        x, v, energies = self._jit_cache[key](
            state.positions, state.velocities, seeds, temps
        )
        new_keys = jax.vmap(lambda k: jax.random.fold_in(k, n_steps))(state.key)
        new_state = MDState(
            positions=x, velocities=v, key=new_keys, step=state.step + n_steps
        )
        return new_state, energies

    def _attempt_swaps(
        self,
        state: MDState,
        energies: jax.Array,
        replica_ids: jax.Array,
        parity: jax.Array,
        key: jax.Array,
    ):
        """Parity-alternating neighbor Metropolis swap, pure array ops.

        For rung pair (r, r+1) with parity matching: accept with
        prob min(1, exp[(beta_r - beta_{r+1})(E_r - E_{r+1})]) and exchange
        the *configurations* (positions/velocities/identities), rescaling
        velocities by sqrt(T_other/T_self).
        """
        R = self.n_replicas
        betas = 1.0 / (BOLTZMANN_CONSTANT_KJ_PER_MOL * self.ladder)
        r = jnp.arange(R)

        # partner of each rung under this parity (self if unpaired)
        is_left = (r % 2) == (parity % 2)
        partner = jnp.where(is_left, r + 1, r - 1)
        partner = jnp.clip(partner, 0, R - 1)
        paired = partner != r
        # unpaired edge rungs keep themselves
        paired = paired & jnp.where(is_left, partner > r, partner < r)

        E_self = energies
        E_part = energies[partner]
        b_self = betas
        b_part = betas[partner]
        log_acc = (b_self - b_part) * (E_self - E_part)
        u = jax.random.uniform(key, (R,))
        # same random draw for both members of a pair: use the left rung's
        pair_lo = jnp.minimum(r, partner)
        accept = (jnp.log(u[pair_lo] + 1e-30) < log_acc) & paired

        target = jnp.where(accept, partner, r)
        # gather configurations from target rungs
        new_positions = state.positions[target]
        scale = jnp.sqrt(self.ladder[r] / self.ladder[target])
        new_velocities = state.velocities[target] * scale[:, None, None]
        new_keys = state.key[target]
        new_ids = replica_ids[target]
        new_state = MDState(
            positions=new_positions,
            velocities=new_velocities,
            key=new_keys,
            step=state.step,
        )
        # per-left-pair acceptance indicator for statistics: (R,) 1/0/nan
        attempted_left = is_left & paired
        acc_left = jnp.where(attempted_left, accept.astype(jnp.float32), jnp.nan)
        return new_state, new_ids, acc_left

    def run(self, n_steps: int) -> RemdResult:
        """Production run: heating, equilibration, then exchange phases.

        The production loop is one ``lax.scan`` over exchange attempts; the
        body runs ``exchange_frequency`` vmapped MD steps then one swap
        sweep. Frames are collected every ``report_interval`` steps.
        """
        cfg = self.config
        if n_steps % cfg.exchange_frequency != 0:
            raise ValueError(
                f"n_steps {n_steps} must be a multiple of exchange_frequency "
                f"{cfg.exchange_frequency}"
            )
        state = self.state
        # cached jitted chunk (retracing per call would dominate wall time)
        def _chunk_jit(n: int):
            key = ("chunk", n)
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(
                    lambda st, temps: self._md_chunk(st, temps, n)
                )
            return self._jit_cache[key]

        # --- gradual heating (CHANGELOG.md:291) ---
        if cfg.heating_steps > 0:
            n_ramp = 10
            per = max(cfg.heating_steps // n_ramp, 1)
            for i in range(n_ramp):
                frac = (i + 1) / n_ramp
                temps = cfg.t_min + frac * (self.ladder - cfg.t_min)
                state, _ = _chunk_jit(per)(state, temps)
        # --- equilibration at target temperatures ---
        if cfg.equilibration_steps > 0:
            state, _ = _chunk_jit(cfg.equilibration_steps)(state, self.ladder)

        n_attempts = n_steps // cfg.exchange_frequency
        frames_per_chunk = max(cfg.exchange_frequency // cfg.report_interval, 1)
        ladder = self.ladder

        def body(carry, attempt_idx):
            state, replica_ids, key = carry
            # MD between exchanges, collecting frames every report_interval
            def sub_chunk(c, _):
                st, _ = c
                st, energies = self._md_chunk(
                    st, ladder, cfg.report_interval
                )
                if cfg.frame_precision == "i16":
                    # XTC-style fixed point at 1e-3 nm; out-of-range
                    # coordinates poison to INT16_MIN (-32.768 nm after
                    # dequant) instead of wrapping silently
                    q = jnp.round(st.positions * 1000.0)
                    pos_out = jnp.where(
                        jnp.abs(q) > 32767.0, -32768.0, q
                    ).astype(jnp.int16)
                else:
                    pos_out = st.positions
                frame = {
                    "positions": pos_out,
                    "energy": energies,
                }
                return (st, energies), frame

            (state, energies), frames = jax.lax.scan(
                sub_chunk, (state, jnp.zeros(self.n_replicas, ladder.dtype)),
                None, length=frames_per_chunk,
            )
            key, sub = jax.random.split(key)
            state, replica_ids, acc = self._attempt_swaps(
                state, energies, replica_ids, attempt_idx, sub
            )
            out = {
                "frames": frames,
                "replica_ids": replica_ids,
                "acceptance": acc,
            }
            return (state, replica_ids, key), out

        def block_fn(n_block: int):
            """Jitted scan over a FIXED number of attempts. Long runs loop
            blocks in Python so compile cost is one-time and independent of
            n_steps (a 50k-step run previously compiled an 18-minute
            500-attempt program; now it reuses one 10-attempt program)."""
            key = ("run", n_block, frames_per_chunk)
            if key not in self._jit_cache:
                self._jit_cache[key] = jax.jit(
                    lambda st, ids, k, off: jax.lax.scan(
                        body, (st, ids, k), off + jnp.arange(n_block)
                    )
                )
            return self._jit_cache[key]

        block = min(cfg.attempts_per_block, n_attempts)
        replica_ids = self.replica_ids
        ids0 = np.asarray(replica_ids)
        key = self._swap_key
        outs = []
        done = 0
        while done < n_attempts:
            n_block = min(block, n_attempts - done)
            (state, replica_ids, key), out = block_fn(n_block)(
                state, replica_ids, key, jnp.asarray(done, jnp.int32)
            )
            # keep block outputs on device: converting here would force a
            # synchronous transfer per block and serialize dispatch (the
            # axon tunnel round-trip is ~100 ms); async dispatch pipelines
            # blocks and the gather at the end pays the latency once —
            # but the queue depth is capped (see RemdConfig
            # .max_async_blocks) so no single blocking wait spans the
            # whole run
            outs.append(out)
            done += n_block
            # start the device->host copy of this block's outputs NOW so
            # the transfer rides alongside the next blocks' compute; the
            # final gather then finds the data already on the host. On
            # the tunneled bench host the end-of-run transfer was 56% of
            # wall (scripts/remd_regression_ab.py) — overlapping it is
            # nearly free elsewhere and a big win there.
            if not getattr(self, "_no_async_copy", False):
                try:
                    for leaf in jax.tree_util.tree_leaves(out):
                        leaf.copy_to_host_async()
                except Exception:  # backend without async D2H: harmless
                    self._no_async_copy = True
            if len(outs) % max(cfg.max_async_blocks, 1) == 0:
                jax.block_until_ready(out)
        out = jax.tree_util.tree_map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
            *outs,
        )
        self.state = state
        self.replica_ids = replica_ids
        # advance the swap stream so repeated run() calls draw fresh randomness
        self._swap_key = jax.random.fold_in(self._swap_key, n_attempts)

        # flatten (A, frames_per_chunk, R, ...) -> (F, R, ...)
        pos = np.asarray(out["frames"]["positions"])
        if pos.dtype == np.int16:
            pos = pos.astype(np.float32) / 1000.0
        F = pos.shape[0] * pos.shape[1]
        pos = pos.reshape((F,) + pos.shape[2:])
        energy = np.asarray(out["frames"]["energy"]).reshape(F, self.n_replicas)
        # head = the PRE-RUN permutation, not the identity: a second
        # run() continues from the previous run's final replica_ids, and
        # demux maps the first attempt chunk's frames through this row
        ids_hist = np.concatenate(
            [np.asarray(ids0, dtype=np.int32)[None],
             np.asarray(out["replica_ids"])], axis=0
        )
        acc = np.asarray(out["acceptance"])  # (A, R) with nan where unattempted
        # per-neighbor-pair acceptance: pair p = (p, p+1) attempted when
        # parity matches; rung p holds the indicator on its attempts
        pair_acc = np.full(self.n_replicas - 1, np.nan)
        for p in range(self.n_replicas - 1):
            vals = acc[:, p]
            vals = vals[np.isfinite(vals)]
            if vals.size:
                pair_acc[p] = float(vals.mean())

        return RemdResult(
            positions=pos,
            potential_energy=energy,
            temperatures=np.asarray(self.ladder),
            replica_ids=ids_hist,
            acceptance_matrix=pair_acc,
            exchange_attempts=n_attempts,
            n_steps=n_steps,
            dt_ps=cfg.dt_ps,
            frames_per_attempt=max(
                cfg.exchange_frequency // cfg.report_interval, 1
            ),
        )


    def run_fused(self, n_steps: int) -> RemdResult:
        """Fully-fused REMD: the ENTIRE run (MD, frame capture, parity
        Metropolis swaps, identity bookkeeping) is one kernel launch
        (md/pallas_md.py build_pallas_remd). Single-chip, unbiased or
        in-kernel-bias configurations; swap randomness comes from the
        on-core PRNG (a different stream than the XLA path)."""
        from ..md.pallas_md import build_pallas_remd

        if self.mesh is not None:
            raise ValueError("run_fused is single-chip; use run() with a mesh")
        if self.bias_fn is not None:
            raise ValueError("run_fused supports in-kernel bias only (pallas_bias)")
        cfg = self.config
        key = ("fused_remd", n_steps)
        if key not in self._jit_cache:
            bias_kwargs = {}
            pb = getattr(self, "_pallas_bias", None)
            if pb is not None:
                bias_kwargs = dict(
                    bias_model=pb["model"], bias_quads=pb["quads"],
                    bias_strength=pb.get("strength", 1.0),
                )
            self._jit_cache[key] = build_pallas_remd(
                self.system, np.asarray(self.ladder),
                dt=cfg.dt_ps, friction=cfg.friction_per_ps,
                n_steps=n_steps,
                exchange_frequency=cfg.exchange_frequency,
                report_interval=cfg.report_interval,
                **bias_kwargs,
            )
        seed = int(np.asarray(self._swap_key).reshape(-1)[0]) & 0x7FFFFFFF
        x, v, frames, fe, ids, acc = self._jit_cache[key](
            self.state.positions, self.state.velocities, seed
        )
        n_attempts = n_steps // cfg.exchange_frequency
        self.state = MDState(
            positions=x, velocities=v,
            key=self.state.key, step=self.state.step + n_steps,
        )
        ids_hist = np.asarray(ids).astype(np.int32)
        self.replica_ids = jnp.asarray(ids_hist[-1])
        self._swap_key = jax.random.fold_in(self._swap_key, n_attempts)

        acc_np = np.asarray(acc)
        pair_acc = np.full(self.n_replicas - 1, np.nan)
        for pair in range(self.n_replicas - 1):
            # pair (p, p+1) is attempted on parities where p is "left"
            attempts = acc_np[pair % 2::2, pair]
            if attempts.size:
                pair_acc[pair] = float(attempts.mean())
        return RemdResult(
            positions=np.asarray(frames),
            potential_energy=np.asarray(fe),
            temperatures=np.asarray(self.ladder),
            replica_ids=ids_hist,
            acceptance_matrix=pair_acc,
            exchange_attempts=n_attempts,
            n_steps=n_steps,
            dt_ps=cfg.dt_ps,
            frames_per_attempt=max(
                cfg.exchange_frequency // cfg.report_interval, 1
            ),
        )


def run_replica_exchange(
    pdb_file,
    *,
    n_steps: int = 10_000,
    config: Optional[RemdConfig] = None,
    bias_fn: Optional[Callable] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
    implicit_solvent: bool = True,
    gb_model: str = "gbn2",
    target_acceptance: Optional[float] = None,
    cutoff: float = 0.9,
    switch_distance: Optional[float] = None,
    nonbonded: str = "auto",
    constraints: Optional[str] = None,
) -> Tuple[RemdResult, System]:
    """One-call REMD (reference CHANGELOG.md:22 run_replica_exchange).

    ``target_acceptance`` replaces the config's geometric ladder with an
    acceptance-targeted one designed from short energy-fluctuation
    probes (remd/ladder.py) between the config's t_min and t_max.

    A solvated input (CRYST1 box + waters) switches automatically to
    EXPLICIT-solvent REMD, mirroring ``run_segment``'s detection: the
    periodic LJ+Coulomb potential at ``cutoff``, rigid TIP3P via SHAKE
    in every replica, constrained bonded terms stripped from the MD
    force path, and ``nonbonded`` engine selection ("dense" O(N^2)
    sweep, "cells" O(N) cell-list kernel, "pme" cells + smooth-PME, or
    "auto": cells past 3000 atoms). Ladder probes and Metropolis swaps
    run through the same force path. ``switch_distance`` enables the
    OpenMM-parity LJ switching function (see ``run_segment``).

    ``constraints="hbonds"`` (implicit path) SHAKE/RATTLEs every X-H
    bond in every replica (OpenMM ``constraints=HBonds``) — with the
    default HMR 3 amu this unlocks the 4 fs implicit production
    protocol (``config.dt_ps=0.004``, ~2x aggregate ns/day). The
    explicit path always constrains; ``constraints="none"`` is rejected
    there."""
    import dataclasses as _dc

    from ..io.pdb import read_pdb
    from ..md.setup import build_explicit_setup, is_explicit_solvent

    if constraints not in (None, "none", "hbonds"):
        raise ValueError(
            f"constraints must be None|'none'|'hbonds', got {constraints!r}"
        )
    config = config or RemdConfig()
    structure = read_pdb(pdb_file) if not hasattr(pdb_file, "residues") \
        else pdb_file
    explicit = is_explicit_solvent(structure)

    cspec = None
    force_fn = None
    minimize_fn = None
    if explicit:
        if constraints == "none":
            raise ValueError(
                "constraints='none' is not available on the explicit-"
                "solvent path: rigid TIP3P water requires SHAKE"
            )
        # the SAME setup recipe run_segment uses (md/setup.py): engine
        # selection, rigid-water/H constraints, stripped MD system, and
        # the full-system minimizer kernel
        setup = build_explicit_setup(
            structure, cutoff=cutoff, switch_distance=switch_distance,
            nonbonded=nonbonded,
        )
        system, positions = setup.system, setup.positions
        cspec = setup.constraints
        force_fn = setup.md_force_fn
        minimize_fn = setup.minimize_force_fn
    else:
        if switch_distance is not None:
            raise ValueError(
                "switch_distance applies to the explicit-solvent "
                "periodic path only; this structure routed to the "
                "implicit-solvent path (NoCutoff, nothing to switch)"
            )
        # the SAME implicit setup recipe run_segment uses (md/setup.py):
        # one auto force-path rule, one constraint protocol — the two
        # inline copies of the >600-atom threshold had started to drift
        from ..md.setup import build_implicit_setup

        isetup = build_implicit_setup(
            structure, implicit_solvent=implicit_solvent,
            gb_model=gb_model, constraints=constraints,
        )
        system, positions = isetup.system, isetup.positions
        cspec, force_fn = isetup.constraints, isetup.force_fn
    if explicit:
        from ..md.minimize import minimize_energy as _minimize

        # minimize through the FULL system's periodic kernel (the MD
        # system has the stiff X-H bonds stripped), then hand the
        # relaxed coordinates to the driver with minimize=False
        positions, _ = _minimize(system, jnp.asarray(positions),
                                 force_fn=minimize_fn)
    if target_acceptance is not None:
        from ..md.minimize import minimize_energy as _minimize
        from .ladder import suggest_temperature_ladder

        xmin = (jnp.asarray(positions) if explicit
                else _minimize(system, jnp.asarray(positions),
                               force_fn=minimize_fn)[0])
        if not explicit:
            # reuse the probe's relaxed coordinates for the production
            # start (minimize=False below) — the ReplicaExchange ctor
            # would otherwise repeat the full minimization from the raw
            # positions, and the ladder design and the run should start
            # from the SAME structure anyway
            positions = xmin
        lo = float(config.ladder()[0])
        hi = float(config.ladder()[-1])
        ladder, _pred = suggest_temperature_ladder(
            system, xmin, t_min=lo, t_max=hi,
            target_acceptance=target_acceptance,
            force_fn=force_fn, constraints=cspec,
            dt_ps=config.dt_ps,
        )
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
            if len(ladder) % n_dev != 0:
                raise ValueError(
                    f"the designed ladder has {len(ladder)} rungs, which "
                    f"does not shard over the {n_dev}-device mesh; drop "
                    "the mesh, widen [t_min, t_max], or pass an explicit "
                    "ladder sized for the mesh"
                )
        config = _dc.replace(
            config, temperatures=tuple(float(t) for t in ladder),
            n_replicas=len(ladder),
        )
    if explicit:
        remd = ReplicaExchange(
            system, positions, config, bias_fn=bias_fn, mesh=mesh,
            force_fn=force_fn, constraints=cspec, minimize=False,
        )
    else:
        remd = ReplicaExchange(
            system, positions, config, bias_fn=bias_fn, mesh=mesh,
            force_fn=force_fn, constraints=cspec,
            minimize=target_acceptance is None,
        )
    return remd.run(n_steps), system


__all__ = ["RemdConfig", "RemdResult", "ReplicaExchange", "run_replica_exchange"]
