"""Render any ISF scene from Python (see also the `path-tracer-tpu` CLI).

Usage: python examples/render_scene.py scene.isf out.png [spp] [bounces]
"""
import sys

from path_tracer_tpu import Profile, load_scene, render
from path_tracer_tpu.config import Resolution
from path_tracer_tpu.utils.image_io import save_png


def main():
    scene_path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else "render.png"
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    bounces = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    scene = load_scene(scene_path)
    profile = Profile(resolution=Resolution(640, 360), samples=spp,
                      bounces=bounces, tonemap="ACES")
    image = render(scene, profile, progress=True)
    save_png(image, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
