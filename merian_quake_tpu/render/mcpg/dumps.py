"""Guiding-state introspection dumps.

Equivalent of the reference's JSON buffer dumps
(render_mcpg.cpp:322-416 → {mc,lc,update_buffer}_dump.json, analyzed
with DuckDB queries and scripts/evaluate_locking_fast.py). Dumps the
ACTIVE subset of the hash grids plus the contention counters.
"""
from __future__ import annotations

import json

import numpy as np

from .config import MCPGState


def dump_mc(state: MCPGState, path: str, limit: int = 1_000_000):
    """Markov-chain states with sum_w > 0 → JSON lines."""
    mc = state.mc
    sw = np.asarray(mc.sum_w)
    idx = np.where(sw > 0)[0][:limit]
    with open(path, "w") as f:
        for i in idx:
            f.write(
                json.dumps(
                    {
                        "index": int(i),
                        "id": int(np.asarray(mc.id)[i]),
                        "sum_w": float(sw[i]),
                        "w_tgt": np.asarray(mc.w_tgt)[i].tolist(),
                        "w_cos": float(np.asarray(mc.w_cos)[i]),
                        "mv": np.asarray(mc.mv)[i].tolist(),
                        "T": float(np.asarray(mc.T)[i]),
                        "N": int(np.asarray(mc.N)[i]),
                        "hash": int(np.asarray(mc.hash)[i]),
                    }
                )
                + "\n"
            )
    return len(idx)


def dump_lc(state: MCPGState, path: str, limit: int = 1_000_000):
    """Light-cache entries with N > 0 → JSON lines, plus the contention
    counters (≈ update_succeeded/update_canceled, grid.h:44-45 — here:
    per-frame applied cells vs merged samples)."""
    lc = state.lc
    n = np.asarray(lc.N)
    idx = np.where(n > 0)[0][:limit]
    with open(path, "w") as f:
        f.write(
            json.dumps(
                {
                    "meta": {
                        "updates_applied": int(state.lc_updates_applied),
                        "updates_merged": int(state.lc_updates_merged),
                        "active_cells": int((n > 0).sum()),
                    }
                }
            )
            + "\n"
        )
        for i in idx:
            f.write(
                json.dumps(
                    {
                        "index": int(i),
                        "hash": int(np.asarray(lc.hash)[i]),
                        "irr": np.asarray(lc.irr)[i].tolist(),
                        "N": int(n[i]),
                    }
                )
                + "\n"
            )
    return len(idx)
