"""Pallas TPU kernel: simultaneous line/region clear-scan (layer T3).

Replaces the reference's NumPy row/column scan (SURVEY.md §3.2 "clear_lines")
with an on-chip kernel over a tile of envs.  TPU-first formulation: a board
tile never reshapes to (H, W) inside the kernel (reshapes fight the (8,128)
lane tiling); instead full-line detection is a small matmul against the
line-membership masks from rules.RuleTables:

    line_occupancy = board_tile @ line_masks.T     # (TILE_N, L)  MXU
    full           = line_occupancy == line_size
    clear_cells    = full @ line_masks             # (TILE_N, HW) MXU
    cleared        = board & ~clear_cells          # VPU
    k              = sum(full)                     # VPU

Line masks cover rows + cols (+ regions for the Woodoku variant) in one
table, so the "compute the full set first, then clear all at once"
simultaneity semantics fall out of a single pass.

The jnp fallback (``clear_scan_reference``) is bit-identical and is the
default engine path on the axon platform (Pallas compile instability,
SURVEY.md §7.0); the kernel runs under ``interpret=True`` in CI.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blockpuzzle_tpu import rules
from blockpuzzle_tpu.config import EnvConfig


def _bf16(x: jax.Array) -> jax.Array:
    """Mosaic-safe cast to bfloat16 (no direct u8/bool→bf16 lowering)."""
    return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _line_table(cfg: EnvConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(L, HW) stacked row+col(+region) masks and (L,) line sizes."""
    t = rules.tables_for(cfg)
    parts = [t.row_masks, t.col_masks]
    if cfg.region_clear:
        parts.append(t.region_masks)
    masks = np.concatenate(parts, axis=0)
    sizes = masks.sum(axis=1).astype(np.float32)
    return masks, sizes


def clear_scan_reference(
    board: jax.Array, line_masks: jax.Array, line_sizes: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """jnp reference implementation (same math as the kernel)."""
    occ = jnp.dot(
        board.astype(jnp.bfloat16),
        line_masks.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    full = occ == line_sizes[None, :]
    clear_cells = jnp.dot(
        full.astype(jnp.bfloat16),
        line_masks.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    cleared = jnp.where(clear_cells > 0, jnp.uint8(0), board)
    k = full.sum(axis=1).astype(jnp.int32)
    return cleared, k


def _clear_kernel(board_ref, masks_t_ref, masks_ref, sizes_ref, out_ref, k_ref):
    board = board_ref[:]
    occ = jnp.dot(
        _bf16(board), masks_t_ref[:], preferred_element_type=jnp.float32
    )
    full = occ == sizes_ref[:]
    clear_cells = jnp.dot(
        _bf16(full), masks_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[:] = jnp.where(clear_cells > 0, jnp.uint8(0), board)
    k_ref[:] = jnp.sum(full.astype(jnp.int32), axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _clear_pallas_call(args, tile_n: int, interpret: bool):
    board, masks_t, masks, sizes = args
    n, hw = board.shape
    num_lines = masks.shape[0]
    grid = (n // tile_n,)
    cleared, k = pl.pallas_call(
        _clear_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, num_lines), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_lines, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_lines), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hw), jnp.uint8),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(board, masks_t, masks, sizes)
    return cleared, k[:, 0]


class ClearScanKernel:
    """Config-bound clear-scan with pallas/jnp selectable at call time."""

    def __init__(self, cfg: EnvConfig, tile_n: int = 256):
        self.cfg = cfg
        self.tile_n = tile_n
        masks, sizes = _line_table(cfg)
        self._masks = jnp.asarray(masks, dtype=jnp.bfloat16)
        self._masks_t = jnp.asarray(masks.T, dtype=jnp.bfloat16)
        self._sizes = jnp.asarray(sizes[None, :], dtype=jnp.float32)

    def reference(self, board: jax.Array) -> Tuple[jax.Array, jax.Array]:
        return clear_scan_reference(
            board, self._masks.astype(jnp.uint8), self._sizes[0]
        )

    def __call__(
        self, board: jax.Array, interpret: bool = False
    ) -> Tuple[jax.Array, jax.Array]:
        n = board.shape[0]
        tile = min(self.tile_n, n)
        if n % tile:
            # ragged batch: fall back (engine batch sizes are powers of two)
            return self.reference(board)
        return _clear_pallas_call(
            (board, self._masks_t, self._masks, self._sizes), tile, interpret
        )
