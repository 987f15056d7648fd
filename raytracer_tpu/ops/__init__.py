"""TPU kernels: the fused solid-scene path tracer and the path-recording
kernel + texture replay for textured scenes."""

from . import pallas_record, pallas_trace
