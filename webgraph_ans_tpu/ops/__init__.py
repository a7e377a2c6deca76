"""TPU compute kernels: lane-parallel rANS decode/encode, grammar FSM,
successor reconstruction, batch random access, device model search."""

from .graph_decode import TpuGraphDecoder
from .random_tpu import TpuRandomAccess
from .reconstruct_jax import reconstruct

__all__ = ["TpuGraphDecoder", "TpuRandomAccess", "reconstruct"]
