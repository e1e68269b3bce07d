"""Multi-device tests on the virtual 8-CPU mesh: sharded scoring parity and
the full dry-run training step."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tspo_tpu.configs import CLIPConfig
from tspo_tpu.models.clip import encode_images, init_clip_params
from tspo_tpu.parallel import create_mesh, clip_param_shardings

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_tp_sharded_clip_matches_replicated():
    cfg = CLIPConfig.tiny()
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32)

    want = np.asarray(encode_images(params, frames, cfg.vision))

    mesh = create_mesh(data=4, model=2)
    sharded = jax.device_put(params, clip_param_shardings(params, mesh))
    frames_sh = jax.device_put(frames, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda p, x: encode_images(p, x, cfg.vision),
                 out_shardings=NamedSharding(mesh, P()))
    got = np.asarray(fn(sharded, frames_sh))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(4)
