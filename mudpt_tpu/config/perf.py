"""Apply the PERF config namespace to the kernel-policy module state.

The perf/numerics knobs (block impl, backward save strategy, text-tower
packing/truncation/recompute, remat, LN dtype) live as module globals so
that pure library use (no Config object) still works.  This module is the
ONE place the typed config meets that state.

Precedence per knob (config/config.py PerfCfg docstring):

  module default  <  programmatic setter  <  explicit config  <  env var

Concretely: a PERF field left at its dataclass default does NOT touch the
module state (so tests and A/B tools that call ``set_block_impl`` etc.
directly keep working, and the env-at-import initialization of each module
stands); an explicitly set field calls the module's setter; a
``MUDPT_TPU_<FIELD>`` env var wins over both — the ad-hoc override layer
the A/B methodology in docs/BENCHMARKS.md depends on.

``perf_snapshot()`` reports the RESOLVED live values — what the process
will actually execute — for metrics.jsonl / serving meta.json, so a run
is reproducible from its recorded config.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict

ENV_PREFIX = "MUDPT_TPU_"


def _as_bool(v: Any) -> bool:
    return str(v).lower() not in ("0", "false", "no", "")


def apply_perf_config(perf) -> Dict[str, Any]:
    """Push ``cfg.PERF`` (+ env overrides) into the policy modules; returns
    the post-application :func:`perf_snapshot`."""
    from mudpt_tpu.models import layers, text, transformer
    from mudpt_tpu.ops import fused_block

    setters = {
        "BLOCK": lambda v: layers.set_block_impl(str(v)),
        "SAVE_ACTS": lambda v: fused_block.set_save_acts(_as_bool(v)),
        "SAVE_MLP_WIDE": lambda v: fused_block.set_save_mlp_wide(str(v)),
        "SCAN_UNROLL": lambda v: transformer.set_scan_unroll(v),
        "REMAT": lambda v: transformer.set_remat_mode(str(v)),
        "TEXT_PACK": lambda v: text.set_text_pack(int(v)),
        "TEXT_TRUNC": lambda v: text.set_text_truncate(str(v) != "0"),
        "TEXT_RECOMPUTE": lambda v: text.set_text_recompute(v),
        "LN": lambda v: layers.set_ln_dtype(str(v)),
    }
    touched = getattr(perf, "_touched", frozenset())
    for f in dataclasses.fields(perf):
        env = os.environ.get(ENV_PREFIX + f.name)
        if env is not None:
            value = env
        elif f.name in touched or getattr(perf, f.name) != f.default:
            # "explicitly set" includes a YAML/CLI write of the default
            # value (PerfCfg._touched) — that must still reapply, e.g.
            # ``PERF.BLOCK auto`` recovering from a leaked set_block_impl
            value = getattr(perf, f.name)
        else:
            continue  # unset: leave module state (programmatic setters win)
        setters[f.name](value)
    return perf_snapshot()


def perf_snapshot() -> Dict[str, Any]:
    """The live, resolved policy state — what this process executes."""
    from mudpt_tpu.models import layers, text, transformer
    from mudpt_tpu.ops import fused_block

    return {
        "BLOCK": layers._BLOCK_IMPL,
        "BLOCK_RESOLVED": layers.resolve_block_impl(),
        "QUANT": layers.quant_mode(),
        "SAVE_ACTS": fused_block.save_acts_enabled(),
        "SAVE_MLP_WIDE": os.environ.get(
            ENV_PREFIX + "SAVE_MLP_WIDE", fused_block._SAVE_MLP_WIDE
        ),
        "SCAN_UNROLL": transformer._SCAN_UNROLL,
        "REMAT": transformer._REMAT_MODE,
        "TEXT_PACK": text._TEXT_PACK,
        "TEXT_TRUNC": text._TEXT_TRUNC,
        "TEXT_RECOMPUTE": text._TEXT_RECOMPUTE,
        "LN": layers._LN_DTYPE,
    }
