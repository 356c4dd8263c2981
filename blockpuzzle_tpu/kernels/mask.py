"""Fused action-mask Pallas kernel: legality matmul + hand selection.

The jnp path materializes the all-pieces counts matrix (N, P*HW) in HBM
(bf16, ~62 MB at N=16K) and re-reads it for the one-hot hand selection —
the two largest ops in the step profile (docs/ARCHITECTURE.md).  This
kernel keeps the counts tile in VMEM: per env tile it computes

    counts = bf16(board) @ cover_T_padded        (MXU, stays in VMEM)
    hand   = sum_p counts[:, p*128 : p*128+128] * onehot[:, p]   (VPU)
    mask   = (hand == 0)                                          (VPU)

and writes only the (TILE_N, S*HW_pad) mask.  Lane alignment: each piece's
anchor block is padded from HW to 128 lanes (Mosaic requires 128-aligned
lane slices); padded anchor columns carry a +1024 bias so they can never
read as legal, and out-of-bounds anchors carry the same bias (validity is
fused, as in the jnp path).

The one-hot weights arrive as a (TILE_N, P_pad) bf16 input; a per-slot
scalar-weighted accumulation over static 128-aligned slices.
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
from blockpuzzle_tpu.kernels.clear import _bf16, _round_up

LANE = 128


def _build_padded_tables(cfg: EnvConfig) -> Tuple[np.ndarray, np.ndarray, int]:
    """cover_T padded to (HW, P*BLK) with per-piece 128-lane blocks, plus a
    (1, P*BLK) bias row (+1024 on invalid/padded anchors)."""
    t = rules.tables_for(cfg)
    hw = cfg.num_cells
    blk = _round_up(hw, LANE)
    p = t.num_pieces
    cover_t = np.zeros((hw, p * blk), np.float32)
    bias = np.full((1, p * blk), 1024.0, np.float32)
    for pi in range(p):
        seg = t.cover[pi * hw : (pi + 1) * hw]          # (HW anchors, HW cells)
        cover_t[:, pi * blk : pi * blk + hw] = seg.T
        valid = t.valid[pi * hw : (pi + 1) * hw]
        bias[0, pi * blk : pi * blk + hw] = np.where(valid, 0.0, 1024.0)
    return cover_t, bias, blk


def _mask_kernel(num_pieces, blk, hw, queue_size,
                 board_ref, oh_ref, cover_t_ref, bias_ref, out_ref):
    board_bf = _bf16(board_ref[:])
    counts = (
        jnp.dot(board_bf, cover_t_ref[:], preferred_element_type=jnp.float32)
        + bias_ref[:]
    )  # (TILE_N, P*BLK) — VMEM-resident
    for s in range(queue_size):
        acc = jnp.zeros(counts[:, :blk].shape, jnp.float32)
        for p in range(num_pieces):
            w = oh_ref[:, s * num_pieces + p : s * num_pieces + p + 1]
            acc = acc + counts[:, p * blk : (p + 1) * blk] * w.astype(
                jnp.float32
            )
        # empty slot -> all-zero one-hot -> acc == 0 everywhere; the bias
        # sum is also zeroed, so force illegality via the weight-sum test
        wsum = jnp.sum(
            oh_ref[:, s * num_pieces : (s + 1) * num_pieces].astype(
                jnp.float32
            ),
            axis=1,
            keepdims=True,
        )
        legal = jnp.logical_and(acc == 0.0, wsum > 0.0)
        out_ref[:, s * blk : (s + 1) * blk] = legal


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def _mask_pallas_call(args, tile_n, num_pieces, blk, hw, queue_size, interpret):
    board, oh, cover_t, bias = args
    n = board.shape[0]
    p_cols = oh.shape[1]
    a_cols = cover_t.shape[1]
    out_cols = queue_size * blk
    grid = (n // tile_n,)
    kern = functools.partial(_mask_kernel, num_pieces, blk, hw, queue_size)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, hw), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, p_cols), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, a_cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, a_cols), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, out_cols), jnp.bool_),
        interpret=interpret,
    )(board, oh, cover_t, bias)


class MaskKernel:
    """Config-bound fused hand-mask computation.

    __call__(board (N, HW) u8, queue (N, S) i32) -> (N, S*HW) bool,
    identical to ``VecBlockPuzzle.action_mask``.
    """

    def __init__(self, cfg: EnvConfig, tile_n: int = 512):
        self.cfg = cfg
        t = rules.tables_for(cfg)
        self.num_pieces = t.num_pieces
        self.tile_n = tile_n
        cover_t, bias, blk = _build_padded_tables(cfg)
        self.blk = blk
        self._cover_t = jnp.asarray(cover_t, dtype=jnp.bfloat16)
        self._bias = jnp.asarray(bias, dtype=jnp.float32)
        self._piece_iota = jnp.arange(t.num_pieces, dtype=jnp.int32)

    def _onehots(self, queue: jax.Array) -> jax.Array:
        """(N, S*P) bf16 concatenated per-slot one-hots (empty -> zeros)."""
        ohs = [
            (queue[:, s : s + 1] == self._piece_iota[None, :]).astype(
                jnp.bfloat16
            )
            for s in range(self.cfg.queue_size)
        ]
        return jnp.concatenate(ohs, axis=1) if len(ohs) > 1 else ohs[0]

    def __call__(
        self, board: jax.Array, queue: jax.Array, interpret: bool = False
    ) -> jax.Array:
        cfg = self.cfg
        n = board.shape[0]
        hw = cfg.num_cells
        tile = min(self.tile_n, n)
        if n % tile:
            raise ValueError(f"batch {n} not divisible by tile {tile}")
        oh = self._onehots(queue)
        out = _mask_pallas_call(
            (board, oh, self._cover_t, self._bias),
            tile, self.num_pieces, self.blk, hw, cfg.queue_size, interpret,
        )  # (N, S*BLK)
        if self.blk == hw:
            return out
        out = out.reshape(n, cfg.queue_size, self.blk)[:, :, :hw]
        return out.reshape(n, cfg.queue_size * hw)
