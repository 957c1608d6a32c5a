from .manifest import Manifest, partition_fingerprint
from .runner import run_extract

__all__ = ["Manifest", "partition_fingerprint", "run_extract"]
