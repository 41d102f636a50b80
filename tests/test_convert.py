"""Weight-converter tests: synthetic torch-layout checkpoints round-trip into
shape-compatible Flax params that the modules accept."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gisnav_tpu.features.convert import superpoint_params_from_torch
from gisnav_tpu.features.superpoint import SuperPoint
from gisnav_tpu.matching.convert import lightglue_params_from_torch
from gisnav_tpu.matching.lightglue import LightGlue


def _fake_superpoint_state(rng):
    dims = {
        "conv1a": (64, 1), "conv1b": (64, 64),
        "conv2a": (64, 64), "conv2b": (64, 64),
        "conv3a": (128, 64), "conv3b": (128, 128),
        "conv4a": (128, 128), "conv4b": (128, 128),
        "convPa": (256, 128), "convDa": (256, 128),
    }
    state = {}
    for name, (o, i) in dims.items():
        state[f"{name}.weight"] = rng.normal(size=(o, i, 3, 3)).astype("f4")
        state[f"{name}.bias"] = rng.normal(size=(o,)).astype("f4")
    state["convPb.weight"] = rng.normal(size=(65, 256, 1, 1)).astype("f4")
    state["convPb.bias"] = rng.normal(size=(65,)).astype("f4")
    state["convDb.weight"] = rng.normal(size=(256, 256, 1, 1)).astype("f4")
    state["convDb.bias"] = rng.normal(size=(256,)).astype("f4")
    return state


def _fake_lightglue_state(rng, depth=2, d=256, head_dim=64, input_dim=256):
    def lin(o, i, bias=True, prefix=""):
        out = {f"{prefix}.weight": rng.normal(size=(o, i)).astype("f4")}
        if bias:
            out[f"{prefix}.bias"] = rng.normal(size=(o,)).astype("f4")
        return out

    state = {}
    state.update(lin(d, input_dim, prefix="input_proj"))
    state.update(lin(head_dim // 2, 2, bias=False, prefix="posenc.Wr"))
    for i in range(depth):
        p = f"transformers.{i}"
        state.update(lin(3 * d, d, prefix=f"{p}.self_attn.Wqkv"))
        state.update(lin(d, d, prefix=f"{p}.self_attn.out_proj"))
        state.update(lin(2 * d, 2 * d, prefix=f"{p}.self_attn.ffn.0"))
        state[f"{p}.self_attn.ffn.1.weight"] = np.ones(2 * d, "f4")
        state[f"{p}.self_attn.ffn.1.bias"] = np.zeros(2 * d, "f4")
        state.update(lin(d, 2 * d, prefix=f"{p}.self_attn.ffn.3"))
        state.update(lin(d, d, prefix=f"{p}.cross_attn.to_qk"))
        state.update(lin(d, d, prefix=f"{p}.cross_attn.to_v"))
        state.update(lin(d, d, prefix=f"{p}.cross_attn.to_out"))
        state.update(lin(2 * d, 2 * d, prefix=f"{p}.cross_attn.ffn.0"))
        state[f"{p}.cross_attn.ffn.1.weight"] = np.ones(2 * d, "f4")
        state[f"{p}.cross_attn.ffn.1.bias"] = np.zeros(2 * d, "f4")
        state.update(lin(d, 2 * d, prefix=f"{p}.cross_attn.ffn.3"))
        state.update(lin(d, d, prefix=f"log_assignment.{i}.final_proj"))
        state.update(lin(1, d, prefix=f"log_assignment.{i}.matchability"))
    return state


class TestSuperPointConvert:
    def test_shapes_and_apply(self, rng):
        state = _fake_superpoint_state(rng)
        params = superpoint_params_from_torch(state)
        model = SuperPoint(max_keypoints=64)
        img = jnp.asarray(rng.uniform(0, 1, (64, 80)).astype(np.float32))
        feats = model.apply(params, img)
        assert feats.keypoints.shape == (64, 2)
        # kernel layout check: torch (O,I,kh,kw) -> flax (kh,kw,I,O)
        assert params["params"]["conv1a"]["kernel"].shape == (3, 3, 1, 64)
        assert params["params"]["convPb"]["kernel"].shape == (1, 1, 256, 65)

    def test_prefix_stripping(self, rng):
        state = {f"net.{k}": v for k, v in _fake_superpoint_state(rng).items()}
        params = superpoint_params_from_torch(state)
        assert "conv1a" in params["params"]

    def test_missing_layer_raises(self, rng):
        state = _fake_superpoint_state(rng)
        del state["conv3b.weight"]
        with pytest.raises(KeyError, match="conv3b"):
            superpoint_params_from_torch(state)


class TestLightGlueConvert:
    def test_shapes_and_apply(self, rng):
        state = _fake_lightglue_state(rng, depth=2)
        params = lightglue_params_from_torch(state, depth=2)
        model = LightGlue(depth=2)
        # the converted tree must be accepted by apply with correct shapes
        k = jnp.asarray(rng.uniform(0, 100, (32, 2)).astype(np.float32))
        desc = jnp.asarray(rng.normal(size=(32, 256)).astype(np.float32))
        mask = jnp.ones(32, bool)
        res = model.apply(params, k, desc, mask, (480, 640),
                          k, desc, mask, (480, 640))
        assert res.matches0.shape == (32,)
        # structural comparison with a freshly initialized tree
        init = model.init(jax.random.PRNGKey(0), k, desc, mask, (480, 640),
                          k, desc, mask, (480, 640))
        s1 = jax.tree.map(lambda a: a.shape, init)
        s2 = jax.tree.map(lambda a: np.asarray(a).shape, params)
        assert s1 == s2

    def test_depth_exceeds_checkpoint_raises(self, rng):
        state = _fake_lightglue_state(rng, depth=2)
        with pytest.raises(ValueError, match="depth"):
            lightglue_params_from_torch(state, depth=5)
