"""Tree validation + canned-scene smoke tests (scaled down for CPU)."""

import numpy as np
import pytest

from svo_raytracer_tpu.core import build_np, validate
from svo_raytracer_tpu.models import scenes
from conftest import make_sphere_voxels


def test_valid_tree_passes(sphere_tree):
    rep = validate.validate_tree(sphere_tree)
    assert rep.ok, rep.errors
    assert rep.reachable == sphere_tree.n_nodes - 7  # root block spares


def test_corrupt_child_pointer_detected(sphere_tree):
    t = sphere_tree.to_numpy()
    t.child[0] = t.n_nodes + 100  # out of range
    rep = validate.validate_tree(t)
    assert not rep.ok
    assert "out of range" in rep.errors[0]


def test_shared_children_detected(sphere_tree):
    t = sphere_tree.to_numpy()
    # point two branches at the same child block
    branches = np.nonzero(np.asarray(t.child[:t.n_nodes]))[0]
    assert len(branches) >= 2
    t.child[branches[1]] = t.child[branches[0]]
    rep = validate.validate_tree(t)
    assert not rep.ok


def test_scene1_smoke():
    tree, cam, cfg = scenes.scene_1(scale=0.5)  # 32^3
    assert tree.n_nodes > 8
    assert cfg.render_mode == 3
    rep = validate.validate_tree(tree.to_numpy())
    assert rep.ok, rep.errors


def test_scene2_smoke():
    tree, cam, cfg = scenes.scene_2(scale=1 / 8)  # 32^3 heightmap
    assert tree.n_nodes > 8
    rep = validate.validate_tree(tree.to_numpy())
    assert rep.ok, rep.errors


def test_scene3_smoke():
    tree, cam, cfg = scenes.scene_3(scale=1 / 16)  # 64^3 caves
    assert tree.n_nodes > 8
    assert cfg.render_mode == 0
    rep = validate.validate_tree(tree.to_numpy())
    assert rep.ok, rep.errors
