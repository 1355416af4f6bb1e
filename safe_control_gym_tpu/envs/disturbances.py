"""Batched, key-driven disturbance injection.

TPU-native counterpart of the reference's disturbance framework
(safe_control_gym/envs/disturbances.py).  A YAML disturbance list per channel
(observation / action / dynamics) compiles to a ``CompiledDisturbances``
program: a pure function of (episode-schedule state, PRNG key, step counter,
target) applied inside the jitted env step.  Randomized schedules (impulse /
step offsets, reference disturbances.py:119-126,166-172) are sampled at reset
from the env's key and carried in the env-state PyTree, so every env instance
in a batch has its own schedule while stepping in lockstep.

Supported types mirror DISTURBANCE_TYPES (disturbances.py:307-312):
impulse, step, uniform, white_noise, periodic — plus full implementations of
the two the reference leaves as stubs: ``brownian`` (random walk,
disturbances.py:251-257 docstring "Simple random walk noise") carried as
float state in the schedule dict and advanced once per control step via
``evolve``, and ``state_dependent`` (disturbances.py:291-305 "Time varying
and state varying, e.g. friction") — a friction-like term
``-coeff * x[state_index]`` read from the env state.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class _Dist:
    kind: str  # impulse | step | uniform | white_noise | periodic | brownian | state_dependent
    dim: int
    mask: Optional[np.ndarray]
    # impulse/step
    magnitude: float = 1.0
    step_offset: Optional[int] = None  # None -> randomized per episode
    duration: int = 1
    decay_rate: float = 1.0
    # uniform
    low: Optional[np.ndarray] = None
    high: Optional[np.ndarray] = None
    # white noise
    std: Optional[np.ndarray] = None
    # periodic
    scale: float = 1.0
    frequency: float = 1.0
    # state_dependent: noise = -coeff * x[state_index] (friction form)
    coeff: Optional[np.ndarray] = None
    state_index: Optional[np.ndarray] = None


@dataclasses.dataclass(frozen=True)
class CompiledDisturbances:
    """One channel's disturbance program."""

    dists: Sequence[_Dist]
    dim: int
    max_step: int  # EPISODE_LEN_SEC / CTRL_TIMESTEP (disturbances.py:112)
    pyb_timestep: float
    ctrl_timestep: float = 0.02

    @property
    def num_scheduled(self) -> int:
        """Number of entries needing a per-episode sampled offset."""
        return sum(
            1 for d in self.dists if d.kind in ("impulse", "step") and d.step_offset is None
        )

    @property
    def walk_dim(self) -> int:
        """Total float state carried by brownian entries."""
        return sum(d.dim for d in self.dists if d.kind == "brownian")

    @property
    def has_brownian(self) -> bool:
        return self.walk_dim > 0

    def init(self, key):
        """Sample the per-episode schedule; returns (num_scheduled,) int32.

        Mirrors Disturbance.reset: offsets ~ randint(max_step)
        (disturbances.py:122-126, 169-172).
        """
        n = self.num_scheduled
        offsets = (
            jax.random.randint(key, (n,), 0, self.max_step, dtype=jnp.int32)
            if n
            else jnp.zeros((0,), jnp.int32)
        )
        return {"offsets": offsets, "walk": jnp.zeros((self.walk_dim,), jnp.float32)}

    def evolve(self, sched, key):
        """Advance brownian walks one control step: W += std*sqrt(dt)*N.

        Call once per env step (after ``apply``); a channel without brownian
        entries returns its schedule unchanged at zero cost.
        """
        if not self.has_brownian:
            return sched
        walk = sched["walk"]
        wi = 0
        parts = []
        ki = 997  # disjoint from apply()'s fold_in counters
        for d in self.dists:
            if d.kind != "brownian":
                continue
            sub = jax.random.fold_in(key, ki)
            ki += 1
            w = walk[wi : wi + d.dim]
            step = jnp.asarray(d.std, walk.dtype) * np.sqrt(self.ctrl_timestep)
            parts.append(w + step * jax.random.normal(sub, (d.dim,), walk.dtype))
            wi += d.dim
        return dict(sched, walk=jnp.concatenate(parts) if parts else walk)

    def apply(self, sched, key, ctrl_step, pyb_step, target, x=None):
        """Sequentially apply all disturbances (disturbances.py:69-79).

        ``x`` is the env state vector, consumed by state_dependent entries.
        """
        dtype = target.dtype
        if isinstance(sched, dict):
            offsets, walk = sched["offsets"], sched["walk"]
        else:  # legacy plain offsets array
            offsets, walk = sched, jnp.zeros((0,), jnp.float32)
        si = 0  # cursor into the offsets vector
        wi = 0  # cursor into the walk vector
        ki = 0  # per-step key counter
        out = target
        for d in self.dists:
            mask = (
                jnp.asarray(d.mask, dtype)
                if d.mask is not None
                else jnp.ones((d.dim,), dtype)
            )
            if d.kind in ("impulse", "step"):
                if d.step_offset is None:
                    offset = offsets[si]
                    si += 1
                else:
                    offset = jnp.asarray(d.step_offset, jnp.int32)
                if d.kind == "impulse":
                    # Triangle/square pulse around the peak step
                    # (disturbances.py:128-143).
                    peak = offset + int(d.duration / 2)
                    peak_offset = jnp.abs(ctrl_step - peak)
                    decay = jnp.where(
                        peak_offset < d.duration / 2,
                        jnp.asarray(d.decay_rate, dtype) ** peak_offset.astype(dtype),
                        jnp.zeros((), dtype),
                    )
                    noise = jnp.where(
                        ctrl_step >= offset, d.magnitude * decay, jnp.zeros((), dtype)
                    )
                else:
                    noise = jnp.where(
                        ctrl_step >= offset,
                        jnp.asarray(d.magnitude, dtype),
                        jnp.zeros((), dtype),
                    )
                out = out + noise * mask
            elif d.kind == "uniform":
                sub = jax.random.fold_in(key, ki)
                ki += 1
                lo = jnp.asarray(d.low, dtype)
                hi = jnp.asarray(d.high, dtype)
                noise = jax.random.uniform(sub, (d.dim,), dtype, 0.0, 1.0) * (hi - lo) + lo
                out = out + noise * mask
            elif d.kind == "white_noise":
                sub = jax.random.fold_in(key, ki)
                ki += 1
                noise = jax.random.normal(sub, (d.dim,), dtype) * jnp.asarray(d.std, dtype)
                out = out + noise * mask
            elif d.kind == "periodic":
                # Random phase each application (disturbances.py:278-288).
                sub = jax.random.fold_in(key, ki)
                ki += 1
                phase = jax.random.uniform(sub, (d.dim,), dtype, -jnp.pi, jnp.pi)
                t = pyb_step.astype(dtype) * self.pyb_timestep
                noise = d.scale * jnp.sin(2 * jnp.pi * d.frequency * t + phase)
                out = out + noise * mask
            elif d.kind == "brownian":
                out = out + walk[wi : wi + d.dim].astype(dtype) * mask
                wi += d.dim
            elif d.kind == "state_dependent":
                assert x is not None, "state_dependent disturbance needs the env state"
                vel = x[jnp.asarray(d.state_index)].astype(dtype)
                out = out - jnp.asarray(d.coeff, dtype) * vel * mask
            else:
                raise ValueError(f"unknown disturbance kind {d.kind!r}")
        return out


def build_disturbances(
    specs: Optional[Sequence[dict]],
    dim: int,
    episode_len_sec: float,
    ctrl_freq: int,
    pyb_freq: int,
) -> Optional[CompiledDisturbances]:
    """Compile one channel's YAML spec list (reference create_disturbance_list,
    disturbances.py:315-333)."""
    if not specs:
        return None
    dists = []
    for spec in specs:
        spec = dict(spec)
        kind = spec.pop("disturbance_func")
        mask = spec.pop("mask", None)
        if mask is not None:
            mask = np.asarray(mask, dtype=float)
            assert mask.shape[0] == dim
        if kind == "impulse":
            d = _Dist(
                kind="impulse",
                dim=dim,
                mask=mask,
                magnitude=float(spec.get("magnitude", 1.0)),
                step_offset=spec.get("step_offset"),
                duration=int(spec.get("duration", 1)),
                decay_rate=float(spec.get("decay_rate", 1.0)),
            )
            assert d.duration >= 1 and 0.0 < d.decay_rate <= 1.0
        elif kind == "step":
            d = _Dist(
                kind="step",
                dim=dim,
                mask=mask,
                magnitude=float(spec.get("magnitude", 1.0)),
                step_offset=spec.get("step_offset"),
            )
        elif kind == "uniform":
            low, high = spec.get("low", 0.0), spec.get("high", 1.0)
            d = _Dist(
                kind="uniform",
                dim=dim,
                mask=mask,
                low=np.broadcast_to(np.asarray(low, float), (dim,)).copy(),
                high=np.broadcast_to(np.asarray(high, float), (dim,)).copy(),
            )
        elif kind == "white_noise":
            std = spec.get("std", 1.0)
            d = _Dist(
                kind="white_noise",
                dim=dim,
                mask=mask,
                std=np.broadcast_to(np.asarray(std, float), (dim,)).copy(),
            )
        elif kind == "periodic":
            d = _Dist(
                kind="periodic",
                dim=dim,
                mask=mask,
                scale=float(spec.get("scale", 1.0)),
                frequency=float(spec.get("frequency", 1.0)),
            )
        elif kind == "brownian":
            std = spec.get("std", 1.0)
            d = _Dist(
                kind="brownian",
                dim=dim,
                mask=mask,
                std=np.broadcast_to(np.asarray(std, float), (dim,)).copy(),
            )
        elif kind == "state_dependent":
            coeff = spec.get("coeff", 1.0)
            state_index = spec.get("state_index")
            assert state_index is not None, "state_dependent needs state_index"
            state_index = np.asarray(state_index, np.int32).reshape(-1)
            assert state_index.shape[0] == dim
            d = _Dist(
                kind="state_dependent",
                dim=dim,
                mask=mask,
                coeff=np.broadcast_to(np.asarray(coeff, float), (dim,)).copy(),
                state_index=state_index,
            )
        else:
            raise ValueError(f"unknown disturbance_func {kind!r}")
        dists.append(d)
    return CompiledDisturbances(
        dists=tuple(dists),
        dim=dim,
        max_step=int(episode_len_sec * ctrl_freq),
        pyb_timestep=1.0 / pyb_freq,
        ctrl_timestep=1.0 / ctrl_freq,
    )
