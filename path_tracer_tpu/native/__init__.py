"""Host-side native (C++) components, loaded via ctypes.

The perf-critical host work — BVH construction over scene triangles — runs in
C++ (native/bvh.cpp), compiled on demand with g++ and cached next to the
source. Device-side traversal lives in ops/bvh_traverse.py.
"""

from path_tracer_tpu.native.build import build_bvh  # noqa: F401
