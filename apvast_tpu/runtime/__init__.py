"""Native real-time host runtime (C++ ring buffers + hop framing)."""

from apvast_tpu.runtime.native import HopFramer, RingBuffer, load_native
from apvast_tpu.runtime.stream_host import StreamHost

__all__ = ["HopFramer", "RingBuffer", "StreamHost", "load_native"]
