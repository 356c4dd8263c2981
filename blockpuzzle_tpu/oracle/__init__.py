"""CPU oracle: reference-faithful Gymnasium env + parity trajectory recorder."""

from blockpuzzle_tpu.oracle.env import BlockPuzzleOracleEnv
from blockpuzzle_tpu.oracle.recorder import (
    RecordingOracle,
    Trajectory,
    record_trajectory,
)

__all__ = [
    "BlockPuzzleOracleEnv",
    "RecordingOracle",
    "Trajectory",
    "record_trajectory",
]
