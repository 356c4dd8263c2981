"""Pallas TPU kernels: placement-collision / legality (layer T3).

Two kernels replacing the reference's per-placement Python scans
(SURVEY.md §3.2 ``can_place`` and the all-anchors game-over scan):

  * ``legality_kernel`` — the all-anchors collision map: one MXU matmul
    ``board_tile(bf16) @ cover_T`` produces occupied-cell counts under every
    (piece, anchor) footprint; the ``== 0 & valid`` epilogue is fused so the
    f32 counts never round-trip through HBM.  The action-space axis is tiled
    in 128-lane chunks.
  * ``apply_kernel`` — fused chosen-action step: overlap test of the
    gathered footprint row, masked place, and the clear-scan (same
    line-mask matmul trick as kernels.clear) in a single pass, emitting the
    new board, lines-cleared count, and legality flag.

Both ship with bit-identical jnp references (the engine's default path on
axon — SURVEY.md §7.0) and run under ``interpret=True`` in CI.
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
from blockpuzzle_tpu.kernels.clear import _bf16, _line_table, _round_up


# ---------------------------------------------------------------------------
# all-anchors legality map
# ---------------------------------------------------------------------------


def _legality_kernel(board_ref, cover_t_ref, valid_ref, out_ref):
    counts = jnp.dot(
        _bf16(board_ref[:]), cover_t_ref[:],
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = jnp.logical_and(counts == 0.0, valid_ref[:] != 0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _legality_pallas_call(args, tile_n: int, tile_a: int, interpret: bool):
    board, cover_t, valid = args
    n, hw = board.shape
    a_pad = cover_t.shape[1]
    grid = (n // tile_n, a_pad // tile_a)
    return pl.pallas_call(
        _legality_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, hw), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, tile_a), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_a), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, tile_a), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, a_pad), jnp.bool_),
        interpret=interpret,
    )(board, cover_t, valid)


class LegalityKernel:
    """All-(piece, anchor) legality for a batch of boards.

    Returns (N, P, HW) bool exactly like ``VecBlockPuzzle.legal_all_pieces``.
    """

    def __init__(self, cfg: EnvConfig, tile_n: int = 256, tile_a: int = 256):
        self.cfg = cfg
        t = rules.tables_for(cfg)
        self.num_pieces = t.num_pieces
        self.tile_n = tile_n
        n_actions = t.cover.shape[0]
        self._a_pad = _round_up(n_actions, tile_a)
        self.tile_a = tile_a
        cover_t = np.zeros((cfg.num_cells, self._a_pad), np.float32)
        cover_t[:, :n_actions] = t.cover.T
        valid = np.zeros((1, self._a_pad), np.int8)
        valid[0, :n_actions] = t.valid
        self._cover_t = jnp.asarray(cover_t, dtype=jnp.bfloat16)
        self._valid = jnp.asarray(valid)
        self._valid_b = jnp.asarray(t.valid)
        self._cover_t_ref = jnp.asarray(t.cover.T, dtype=jnp.bfloat16)

    def reference(self, board: jax.Array) -> jax.Array:
        counts = jnp.dot(
            board.astype(jnp.bfloat16),
            self._cover_t_ref,
            preferred_element_type=jnp.float32,
        )
        legal = jnp.logical_and(counts == 0, self._valid_b[None, :])
        return legal.reshape(board.shape[0], self.num_pieces, self.cfg.num_cells)

    def __call__(self, board: jax.Array, interpret: bool = False) -> jax.Array:
        n = board.shape[0]
        tile = min(self.tile_n, n)
        if n % tile:
            return self.reference(board)
        out = _legality_pallas_call(
            (board, self._cover_t, self._valid), tile, self.tile_a, interpret
        )
        out = out[:, : self.num_pieces * self.cfg.num_cells]
        return out.reshape(n, self.num_pieces, self.cfg.num_cells)


# ---------------------------------------------------------------------------
# fused chosen-action apply (collision + place + clear)
# ---------------------------------------------------------------------------


def _apply_kernel(
    board_ref, cover_ref, valid_ref, masks_t_ref, masks_ref, sizes_ref,
    board_out_ref, k_ref, legal_ref,
):
    # Mosaic note: per-row scalars must never be (TILE_N, 1) tensors that
    # later broadcast across lanes ("Lane broadcast: not implemented" on
    # this platform).  Row scalars are therefore spread to full lane width
    # via MXU products with a ones matrix.
    board = board_ref[:]
    cover = cover_ref[:]
    hw = board.shape[1]
    ones_hh = jnp.ones((hw, hw), dtype=jnp.bfloat16)
    # every lane of overlap_full holds the row's total overlap count
    overlap_full = jnp.dot(
        _bf16(board & cover), ones_hh, preferred_element_type=jnp.float32
    )
    valid_full = jnp.dot(
        _bf16(valid_ref[:]),  # (TILE_N, 1) int8 input
        jnp.ones((1, hw), dtype=jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    legal_full = jnp.logical_and(valid_full != 0.0, overlap_full == 0.0)
    placed = jnp.where(legal_full, board | cover, board)
    occ = jnp.dot(
        _bf16(placed), masks_t_ref[:], preferred_element_type=jnp.float32
    )
    full = occ == sizes_ref[:]
    clear_cells = jnp.dot(
        _bf16(full), masks_ref[:], preferred_element_type=jnp.float32
    )
    cleared = jnp.where(clear_cells > 0, jnp.uint8(0), placed)
    # illegal action = strict no-op, even on boards that (adversarially)
    # already hold a full line — matches oracle semantics
    board_out_ref[:] = jnp.where(legal_full, cleared, board)
    legal_col = legal_full[:, :1]                       # (TILE_N, 1) slice
    k_ref[:] = jnp.where(
        legal_col,
        jnp.sum(full.astype(jnp.int32), axis=1, keepdims=True),
        0,
    )
    legal_ref[:] = legal_col


@functools.partial(jax.jit, static_argnums=(1, 2))
def _apply_pallas_call(args, tile_n: int, interpret: bool):
    board, cover, valid, masks_t, masks, sizes = args
    n, hw = board.shape
    num_lines = masks.shape[0]
    grid = (n // tile_n,)
    return pl.pallas_call(
        _apply_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, num_lines), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_lines, hw), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_lines), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hw), jnp.uint8),
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, 1), jnp.bool_),
        ],
        interpret=interpret,
    )(board, cover, valid, masks_t, masks, sizes)


class ApplyKernel:
    """Fused collision + place + clear for the chosen action.

    Inputs: board (N, HW) u8, gathered footprint rows (N, HW) u8, per-env
    validity (N,) bool.  Outputs: (new_board, k, legal).
    """

    def __init__(self, cfg: EnvConfig, tile_n: int = 256):
        self.cfg = cfg
        self.tile_n = tile_n
        masks, sizes = _line_table(cfg)
        self._masks = jnp.asarray(masks, dtype=jnp.bfloat16)
        self._masks_t = jnp.asarray(masks.T, dtype=jnp.bfloat16)
        self._sizes = jnp.asarray(sizes[None, :], dtype=jnp.float32)

    def reference(
        self, board: jax.Array, cover: jax.Array, valid: jax.Array
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        overlap = jnp.sum((board & cover).astype(jnp.int32), axis=1)
        legal = jnp.logical_and(valid, overlap == 0)
        placed = jnp.where(legal[:, None], board | cover, board)
        occ = jnp.dot(
            placed.astype(jnp.bfloat16),
            self._masks_t,
            preferred_element_type=jnp.float32,
        )
        full = occ == self._sizes
        clear_cells = jnp.dot(
            full.astype(jnp.bfloat16),
            self._masks,
            preferred_element_type=jnp.float32,
        )
        cleared = jnp.where(clear_cells > 0, jnp.uint8(0), placed)
        new_board = jnp.where(legal[:, None], cleared, board)
        k = jnp.where(legal, full.sum(axis=1).astype(jnp.int32), 0)
        return new_board, k, legal

    def __call__(
        self,
        board: jax.Array,
        cover: jax.Array,
        valid: jax.Array,
        interpret: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        n = board.shape[0]
        tile = min(self.tile_n, n)
        if n % tile:
            return self.reference(board, cover, valid)
        new_board, k, legal = _apply_pallas_call(
            (board, cover, valid[:, None].astype(jnp.int8),
             self._masks_t, self._masks, self._sizes),
            tile,
            interpret,
        )
        return new_board, k[:, 0], legal[:, 0]
