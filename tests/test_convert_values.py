"""Value-level checkpoint-converter parity vs independent torch ports.

Round-2 verdict: the converters (``matching/convert.py``,
``features/convert.py``) were layout-tested only — descriptor/match-level
agreement with a real checkpoint had never been demonstrated. The environment
has no network access for the official weights, but the ``transformers``
library ships independent, faithful torch ports of both models
(``models/superpoint``, ``models/lightglue``). These tests randomly
initialize those torch models, export their weights in the OFFICIAL
checkpoint layouts (MagicLeap ``superpoint_v1.pth`` names; the official
LightGlue release's fused/interleaved ``Wqkv`` packing per
``SelfBlock.forward``'s ``qkv.unflatten(-1, (num_heads, -1, 3))``), run the
converters, and assert numeric agreement between the torch forward and this
framework's flax forward.

This catches exactly the class of bug layout tests cannot: a converter that
produces the right shapes but scrambled values (e.g. the q/k/v interleave of
the fused Wqkv projection, fixed alongside this test).

Reference consumer of the real checkpoints: ``core/pose_node.py:94-122``
(kornia ``LightGlueMatcher``) in hmakelin/gisnav.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ---------------------------------------------------------------------------
# SuperPoint
# ---------------------------------------------------------------------------


def _magicleap_state_dict(tm):
    """Export a transformers SuperPoint model in the MagicLeap layout."""
    sd = {}
    pairs = {
        "conv1a": tm.encoder.conv_blocks[0].conv_a,
        "conv1b": tm.encoder.conv_blocks[0].conv_b,
        "conv2a": tm.encoder.conv_blocks[1].conv_a,
        "conv2b": tm.encoder.conv_blocks[1].conv_b,
        "conv3a": tm.encoder.conv_blocks[2].conv_a,
        "conv3b": tm.encoder.conv_blocks[2].conv_b,
        "conv4a": tm.encoder.conv_blocks[3].conv_a,
        "conv4b": tm.encoder.conv_blocks[3].conv_b,
        "convPa": tm.keypoint_decoder.conv_score_a,
        "convPb": tm.keypoint_decoder.conv_score_b,
        "convDa": tm.descriptor_decoder.conv_descriptor_a,
        "convDb": tm.descriptor_decoder.conv_descriptor_b,
    }
    for name, mod in pairs.items():
        sd[f"{name}.weight"] = mod.weight.detach()
        sd[f"{name}.bias"] = mod.bias.detach()
    return sd


class TestSuperPointConverterValues:
    @pytest.fixture(scope="class")
    def torch_superpoint(self):
        from transformers.models.superpoint.modeling_superpoint import (
            SuperPointForKeypointDetection,
        )
        from transformers import SuperPointConfig

        torch.manual_seed(0)
        cfg = SuperPointConfig()
        model = SuperPointForKeypointDetection(cfg).eval()
        return model.superpoint if hasattr(model, "superpoint") else model

    def test_detector_logits_match(self, torch_superpoint):
        """conv1a..convPb: converted flax logits == torch logits (f32)."""
        from gisnav_tpu.features.convert import superpoint_params_from_torch
        from gisnav_tpu.features.superpoint import SuperPoint

        tm = torch_superpoint
        params = superpoint_params_from_torch(_magicleap_state_dict(tm))

        rng = np.random.default_rng(0)
        h, w = 64, 96
        img = rng.uniform(0, 1, (h, w)).astype(np.float32)

        with torch.no_grad():
            x = torch.from_numpy(img)[None, None]
            enc = tm.encoder(x).last_hidden_state
            kd = tm.keypoint_decoder
            torch_logits = kd.conv_score_b(kd.relu(kd.conv_score_a(enc)))
            torch_logits = (
                torch_logits[0].permute(1, 2, 0).numpy()
            )  # (h/8, w/8, 65)
            dd = tm.descriptor_decoder
            dmap = dd.conv_descriptor_b(dd.relu(dd.conv_descriptor_a(enc)))
            dmap = torch.nn.functional.normalize(dmap, p=2, dim=1)
            torch_dmap = dmap[0].permute(1, 2, 0).numpy()  # (h/8, w/8, 256)

        model = SuperPoint(
            max_keypoints=64,
            compute_dtype=jnp.float32,
            conv_backend="xla_batched",
        )
        feats, logits = model.apply(params, jnp.asarray(img),
                                    return_logits=True)
        np.testing.assert_allclose(
            np.asarray(logits), torch_logits, rtol=1e-4, atol=1e-4
        )

        # descriptor head (convDa/convDb): sample our descriptors at exact
        # cell centers of the torch dense map via the keypoints the model
        # found, tolerating the (documented) sub-cell sampling-convention
        # difference by comparing at the nearest cell
        kp = np.asarray(feats.keypoints)[np.asarray(feats.mask)]
        desc = np.asarray(feats.descriptors)[np.asarray(feats.mask)]
        assert len(kp) > 0
        cells = np.clip(
            ((kp - 4.0 + 0.5) / 8.0).round().astype(int),
            0, [w // 8 - 1, h // 8 - 1],
        )
        ref = torch_dmap[cells[:, 1], cells[:, 0]]
        cos = np.sum(desc * ref, axis=1)
        # descriptors are L2-normalized; near-cell-center keypoints must
        # agree with the dense torch map almost exactly
        assert np.median(cos) > 0.99


# ---------------------------------------------------------------------------
# LightGlue
# ---------------------------------------------------------------------------


def _official_lightglue_state_dict(tm, depth: int, heads: int, dim: int):
    """Export a transformers LightGlue model in the official repo layout.

    The official ``SelfBlock`` fuses q/k/v into one ``Wqkv`` Linear whose
    output rows are ordered ``(head, head_dim, 3)`` — component INTERLEAVED
    per scalar (``qkv.unflatten(-1, (num_heads, -1, 3))``). The official
    ``CrossBlock`` shares one ``to_qk`` projection for both directions, so
    the transformers model's cross ``k_proj`` must be tied to ``q_proj``
    before export (done by the caller).
    """
    dh = dim // heads
    sd = {
        "posenc.Wr.weight": tm.positional_encoder.projector.weight.detach(),
    }
    if not isinstance(tm.input_projection, torch.nn.Identity):
        sd["input_proj.weight"] = tm.input_projection.weight.detach()
        sd["input_proj.bias"] = tm.input_projection.bias.detach()
    for i, layer in enumerate(tm.transformer_layers):
        sa = layer.self_attention
        q, k, v = (m.weight.detach() for m in (sa.q_proj, sa.k_proj, sa.v_proj))
        # stack to (out=h*dh, 3, in) then reshape: row h*3dh + d*3 + comp
        wqkv = torch.stack([q, k, v], dim=1).reshape(3 * dim, dim)
        sd[f"transformers.{i}.self_attn.Wqkv.weight"] = wqkv
        qb, kb, vb = (m.bias.detach() for m in (sa.q_proj, sa.k_proj, sa.v_proj))
        sd[f"transformers.{i}.self_attn.Wqkv.bias"] = torch.stack(
            [qb, kb, vb], dim=1
        ).reshape(3 * dim)
        sd[f"transformers.{i}.self_attn.out_proj.weight"] = \
            sa.o_proj.weight.detach()
        sd[f"transformers.{i}.self_attn.out_proj.bias"] = \
            sa.o_proj.bias.detach()
        for kind, mlp in (("self_attn", layer.self_mlp),
                          ("cross_attn", layer.cross_mlp)):
            sd[f"transformers.{i}.{kind}.ffn.0.weight"] = mlp.fc1.weight.detach()
            sd[f"transformers.{i}.{kind}.ffn.0.bias"] = mlp.fc1.bias.detach()
            sd[f"transformers.{i}.{kind}.ffn.1.weight"] = \
                mlp.layer_norm.weight.detach()
            sd[f"transformers.{i}.{kind}.ffn.1.bias"] = \
                mlp.layer_norm.bias.detach()
            sd[f"transformers.{i}.{kind}.ffn.3.weight"] = mlp.fc2.weight.detach()
            sd[f"transformers.{i}.{kind}.ffn.3.bias"] = mlp.fc2.bias.detach()
        ca = layer.cross_attention
        sd[f"transformers.{i}.cross_attn.to_qk.weight"] = \
            ca.q_proj.weight.detach()
        sd[f"transformers.{i}.cross_attn.to_qk.bias"] = ca.q_proj.bias.detach()
        sd[f"transformers.{i}.cross_attn.to_v.weight"] = \
            ca.v_proj.weight.detach()
        sd[f"transformers.{i}.cross_attn.to_v.bias"] = ca.v_proj.bias.detach()
        sd[f"transformers.{i}.cross_attn.to_out.weight"] = \
            ca.o_proj.weight.detach()
        sd[f"transformers.{i}.cross_attn.to_out.bias"] = \
            ca.o_proj.bias.detach()
    for i, mal in enumerate(tm.match_assignment_layers):
        sd[f"log_assignment.{i}.final_proj.weight"] = \
            mal.final_projection.weight.detach()
        sd[f"log_assignment.{i}.final_proj.bias"] = \
            mal.final_projection.bias.detach()
        sd[f"log_assignment.{i}.matchability.weight"] = \
            mal.matchability.weight.detach()
        sd[f"log_assignment.{i}.matchability.bias"] = \
            mal.matchability.bias.detach()
    return sd


class TestLightGlueConverterValues:
    DEPTH = 2
    HEADS = 4
    DIM = 256
    K = 64

    @pytest.fixture(scope="class")
    def torch_lightglue(self):
        from transformers import LightGlueConfig
        from transformers.models.lightglue.modeling_lightglue import (
            LightGlueForKeypointMatching,
        )

        torch.manual_seed(1)
        cfg = LightGlueConfig(
            num_hidden_layers=self.DEPTH,
            depth_confidence=-1.0,  # disable early exit
            width_confidence=-1.0,  # disable pruning
            filter_threshold=0.0,
            attn_implementation="eager",
        )
        tm = LightGlueForKeypointMatching(cfg).eval()
        # official CrossBlock shares to_qk for queries AND keys: tie
        with torch.no_grad():
            for layer in tm.transformer_layers:
                ca = layer.cross_attention
                ca.k_proj.weight.copy_(ca.q_proj.weight)
                ca.k_proj.bias.copy_(ca.q_proj.bias)
        return tm

    def _pair(self):
        rng = np.random.default_rng(5)
        k = self.K
        kp0 = rng.uniform(8, [632, 472], size=(k, 2)).astype(np.float32)
        kp1 = rng.uniform(8, [632, 472], size=(k, 2)).astype(np.float32)
        d0 = rng.normal(size=(k, 256)).astype(np.float32)
        d1 = d0 + 0.2 * rng.normal(size=(k, 256)).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
        return kp0, kp1, d0, d1

    def test_matches_and_scores_match_torch(self, torch_lightglue):
        from gisnav_tpu.matching.convert import lightglue_params_from_torch
        from gisnav_tpu.matching.lightglue import LightGlue

        tm = torch_lightglue
        sd = _official_lightglue_state_dict(tm, self.DEPTH, self.HEADS,
                                            self.DIM)
        params = lightglue_params_from_torch(sd, depth=self.DEPTH,
                                             heads=self.HEADS)

        kp0, kp1, d0, d1 = self._pair()
        h, w = 480, 640

        with torch.no_grad():
            matches, mscores, _, _, _ = tm._match_image_pair(
                keypoints=torch.stack(
                    [torch.from_numpy(kp0), torch.from_numpy(kp1)]
                )[None],
                descriptors=torch.stack(
                    [torch.from_numpy(d0), torch.from_numpy(d1)]
                )[None],
                height=h,
                width=w,
                mask=torch.ones(1, 2, self.K, dtype=torch.int32),
            )
        # get_matches_from_scores returns (batch*2, K): row 0 = image 0
        t_matches0 = matches[0].numpy()
        t_mscores0 = mscores[0].numpy()

        model = LightGlue(
            depth=self.DEPTH,
            filter_threshold=0.0,
            compute_dtype=jnp.float32,
            gelu_approximate=False,  # official torch uses exact erf gelu
        )
        res = model.apply(
            params,
            jnp.asarray(kp0), jnp.asarray(d0),
            jnp.ones(self.K, bool), (h, w),
            jnp.asarray(kp1), jnp.asarray(d1),
            jnp.ones(self.K, bool), (h, w),
        )
        ours0 = np.asarray(res.matches0)
        agree = (ours0 == t_matches0).mean()
        assert agree > 0.98, (ours0[:16], t_matches0[:16])
        both = (ours0 >= 0) & (t_matches0 >= 0)
        if both.any():
            np.testing.assert_allclose(
                np.asarray(res.mscores0)[both], t_mscores0[both],
                rtol=1e-3, atol=1e-4,
            )

    def test_wqkv_deinterleave_layout(self, torch_lightglue):
        """The converted flax Wqkv's component-major column blocks must
        recover the torch per-component projection rows exactly — guards the
        de-interleave against regressions to a plain transpose."""
        from gisnav_tpu.matching.convert import lightglue_params_from_torch

        tm = torch_lightglue
        sd = _official_lightglue_state_dict(tm, self.DEPTH, self.HEADS,
                                            self.DIM)
        params = lightglue_params_from_torch(sd, depth=self.DEPTH,
                                             heads=self.HEADS)
        dim, heads = self.DIM, self.HEADS
        dh = dim // heads
        for i in range(self.DEPTH):
            sa = tm.transformer_layers[i].self_attention
            kernel = params["params"][f"self_{i}"]["Wqkv"]["kernel"]
            bias = params["params"][f"self_{i}"]["Wqkv"]["bias"]
            # flax module slices qkv.reshape(K, h, 3, dh): column block for
            # (head h, component c) is [h*3*dh + c*dh : ... + dh]
            for comp, mod in enumerate((sa.q_proj, sa.k_proj, sa.v_proj)):
                tw = mod.weight.detach().numpy()  # (out=h*dh+d, in)
                tb = mod.bias.detach().numpy()
                for h in range(heads):
                    col = h * 3 * dh + comp * dh
                    np.testing.assert_allclose(
                        kernel[:, col:col + dh],
                        tw[h * dh:(h + 1) * dh].T,
                        rtol=0, atol=0,
                    )
                    np.testing.assert_allclose(
                        bias[col:col + dh], tb[h * dh:(h + 1) * dh],
                        rtol=0, atol=0,
                    )
