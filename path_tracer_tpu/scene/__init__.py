"""Scene layer: ISF schema/loader, glTF converter, host→device SoA scene."""

from path_tracer_tpu.scene import isf  # noqa: F401
from path_tracer_tpu.scene.device_scene import DeviceScene, build_device_scene  # noqa: F401


def load_scene(path):
    """Load an ISF scene file and build the device SoA scene.

    Mirrors ``load_internal`` (ref: src/scene/mod.rs:16-22): texture paths are
    resolved relative to the scene file's directory.
    """
    import pathlib

    path = pathlib.Path(path)
    scene = isf.load(path)
    return build_device_scene(scene, root=path.parent)
