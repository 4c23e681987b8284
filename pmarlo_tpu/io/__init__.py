"""Host-side I/O: PDB structures, trajectory stores, shard datasets.

The framework's own trajectory format is npz (time-major coordinate
tensors + JSON metadata) rather than DCD — device-friendly, seekable, and
self-describing. PDB support covers the prep path (reference:
src/pmarlo/io/trajectory_reader.py, trajectory_writer.py).
"""

from .pdb import PDBStructure, read_pdb, write_pdb
from .trajectory import TrajectoryWriter, TrajectoryReader, iterload
from .shards import write_shard, read_shard, select_shard_paths, shard_id

__all__ = [
    "PDBStructure",
    "read_pdb",
    "write_pdb",
    "TrajectoryWriter",
    "TrajectoryReader",
    "iterload",
    "write_shard",
    "read_shard",
    "select_shard_paths",
    "shard_id",
]
