"""Checkpoint/resume: an interrupted render resumed from its checkpoint must
equal the uninterrupted render exactly (counter-based RNG ⇒ sample ids are
the only state)."""
import numpy as np
import pytest

from path_tracer_tpu.config import Profile, Resolution
from path_tracer_tpu.models.renderer import render
from path_tracer_tpu.scene.procedural import cornell_device_scene


@pytest.fixture(scope="module")
def scene():
    return cornell_device_scene()


def _profile(samples):
    return Profile(resolution=Resolution(16, 12), samples=samples, bounces=1,
                   alpha_walk_steps=2, shadow_walk_steps=2,
                   samples_per_launch=2)


def test_resume_matches_straight_render(scene, tmp_path):
    ckpt = tmp_path / "render.ckpt"

    full = render(scene, _profile(8))

    # First "run" renders 4 samples and checkpoints.
    render(scene, _profile(4), checkpoint_path=ckpt)
    assert ckpt.exists()
    # Second run resumes from sample 5 and completes 8.
    resumed = render(scene, _profile(8), checkpoint_path=ckpt)

    np.testing.assert_array_equal(full, resumed)


def test_mismatched_checkpoint_rejected(scene, tmp_path):
    ckpt = tmp_path / "render.ckpt"
    render(scene, _profile(2), checkpoint_path=ckpt)
    bad = Profile(resolution=Resolution(8, 8), samples=2, bounces=1,
                  alpha_walk_steps=2, shadow_walk_steps=2)
    with pytest.raises(ValueError, match="different render config"):
        render(scene, bad, checkpoint_path=ckpt)


def test_completed_checkpoint_short_circuits(scene, tmp_path):
    ckpt = tmp_path / "render.ckpt"
    first = render(scene, _profile(4), checkpoint_path=ckpt)
    again = render(scene, _profile(4), checkpoint_path=ckpt)
    np.testing.assert_array_equal(first, again)
