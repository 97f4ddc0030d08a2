"""Weight-mapping tests: the diffusers->flax mapping must produce exactly
the parameter tree our Flax modules expect (structure + shapes), from a
synthetic torch-layout state dict derived from the flax tree by an
independent inverse-naming walk. Catches naming/layout drift between
guidance/sd_flax.py and guidance/sd_loader.py without shipping weights."""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dreamscene_tpu.guidance import sd_loader as L
from dreamscene_tpu.guidance.sd_flax import (
    FlaxUNet2DCondition,
    FlaxVAEDecoder,
    FlaxVAEEncoder,
    UNetConfig,
    VAEConfig,
)

UCFG = UNetConfig(
    block_out_channels=(8, 16),
    layers_per_block=1,
    cross_attention_dim=16,
    attention_head_dim=8,
    num_groups=4,
    with_cross_attn=(True, True),
    dtype=jnp.float32,
)
VCFG = VAEConfig(block_out_channels=(8, 16), layers_per_block=1, num_groups=4,
                 dtype=jnp.float32)


def flax_leaf_to_torch(path, leaf):
    """Inverse of the loader's leaf transforms."""
    name = path[-1]
    if name == "kernel":
        if leaf.ndim == 4:
            return np.transpose(np.asarray(leaf), (3, 2, 0, 1)), "weight"
        return np.transpose(np.asarray(leaf), (1, 0)), "weight"
    if name == "scale":
        return np.asarray(leaf), "weight"
    return np.asarray(leaf), "bias"


def unet_flax_path_to_torch(path):
    """module-path -> diffusers key prefix (inverse naming walk)."""
    mod = path[0]
    rest = list(path[1:-1])
    n = len(UCFG.block_out_channels)

    def tb(rest):
        out = []
        for p in rest:
            if p == "transformer_blocks_0":
                out.append("transformer_blocks.0")
            elif p == "net_0_proj":
                out.append("net.0.proj")
            elif p == "net_2":
                out.append("net.2")
            elif p == "to_out_0":
                out.append("to_out.0")
            elif p == "ff":
                out.append("ff")
            else:
                out.append(p)
        return out

    m = re.match(r"down_(\d+)_res_(\d+)$", mod)
    if m:
        return ".".join([f"down_blocks.{m[1]}.resnets.{m[2]}"] + rest)
    m = re.match(r"down_(\d+)_attn_(\d+)$", mod)
    if m:
        return ".".join([f"down_blocks.{m[1]}.attentions.{m[2]}"] + tb(rest))
    m = re.match(r"down_(\d+)_downsample$", mod)
    if m:
        return f"down_blocks.{m[1]}.downsamplers.0.conv"
    m = re.match(r"up_(\d+)_res_(\d+)$", mod)
    if m:
        return ".".join(
            [f"up_blocks.{n - 1 - int(m[1])}.resnets.{m[2]}"] + rest)
    m = re.match(r"up_(\d+)_attn_(\d+)$", mod)
    if m:
        return ".".join(
            [f"up_blocks.{n - 1 - int(m[1])}.attentions.{m[2]}"] + tb(rest))
    m = re.match(r"up_(\d+)_upsample$", mod)
    if m:
        return f"up_blocks.{n - 1 - int(m[1])}.upsamplers.0.conv"
    if mod == "mid_res_0":
        return ".".join(["mid_block.resnets.0"] + rest)
    if mod == "mid_res_1":
        return ".".join(["mid_block.resnets.1"] + rest)
    if mod == "mid_attn":
        return ".".join(["mid_block.attentions.0"] + tb(rest))
    if mod == "time_embedding_linear_1":
        return "time_embedding.linear_1"
    if mod == "time_embedding_linear_2":
        return "time_embedding.linear_2"
    return ".".join([mod] + rest)


def make_torch_sd(params, path_fn):
    sd = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for kpath, leaf in flat:
        path = tuple(p.key for p in kpath)
        assert path[0] == "params"
        arr, suffix = flax_leaf_to_torch(path, leaf)
        # module path without "params" and the leaf name
        key = path_fn(path[1:])
        sd[f"{key}.{suffix}"] = arr
    return sd


class TestUNetMapping:
    def test_roundtrip_structure_and_values(self):
        unet = FlaxUNet2DCondition(UCFG)
        params = unet.init(
            jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3, 16)),
        )
        sd = make_torch_sd(params, unet_flax_path_to_torch)
        mapped = L.map_unet_state(sd, UCFG)

        ref_paths = {
            tuple(p.key for p in k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        got_paths = {
            tuple(p.key for p in k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(mapped)[0]
        }
        assert got_paths == ref_paths
        # values round-trip exactly
        for (kp, v), (kp2, v2) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(mapped)[0],
        ):
            np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
        # and the mapped tree actually runs
        out = unet.apply(mapped, jnp.ones((1, 8, 8, 4)),
                         jnp.asarray([5], jnp.int32), jnp.ones((1, 3, 16)))
        assert out.shape == (1, 8, 8, 4)


def vae_enc_path_to_torch(path):
    mod = path[0]
    rest = list(path[1:-1])
    if mod == "quant_conv":
        return "quant_conv"
    m = re.match(r"down_(\d+)_res_(\d+)$", mod)
    if m:
        return ".".join([f"encoder.down_blocks.{m[1]}.resnets.{m[2]}"] + rest)
    m = re.match(r"down_(\d+)_downsample$", mod)
    if m:
        return f"encoder.down_blocks.{m[1]}.downsamplers.0.conv"
    if mod == "mid_res_0":
        return ".".join(["encoder.mid_block.resnets.0"] + rest)
    if mod == "mid_res_1":
        return ".".join(["encoder.mid_block.resnets.1"] + rest)
    if mod == "mid_attn":
        sub = {"to_out_0": "to_out.0"}.get(path[1], path[1])
        return f"encoder.mid_block.attentions.0.{sub}"
    return ".".join(["encoder." + mod] + rest)


def vae_dec_path_to_torch(path):
    mod = path[0]
    rest = list(path[1:-1])
    n = len(VCFG.block_out_channels)
    if mod == "post_quant_conv":
        return "post_quant_conv"
    m = re.match(r"up_(\d+)_res_(\d+)$", mod)
    if m:
        return ".".join(
            [f"decoder.up_blocks.{n - 1 - int(m[1])}.resnets.{m[2]}"] + rest)
    m = re.match(r"up_(\d+)_upsample$", mod)
    if m:
        return f"decoder.up_blocks.{n - 1 - int(m[1])}.upsamplers.0.conv"
    if mod == "mid_res_0":
        return ".".join(["decoder.mid_block.resnets.0"] + rest)
    if mod == "mid_res_1":
        return ".".join(["decoder.mid_block.resnets.1"] + rest)
    if mod == "mid_attn":
        sub = {"to_out_0": "to_out.0"}.get(path[1], path[1])
        return f"decoder.mid_block.attentions.0.{sub}"
    return ".".join(["decoder." + mod] + rest)


class TestVAEMapping:
    def test_encoder_roundtrip(self):
        enc = FlaxVAEEncoder(VCFG)
        params = enc.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        sd = make_torch_sd(params, vae_enc_path_to_torch)
        mapped = L.map_vae_encoder_state(sd, VCFG)
        ref = {tuple(p.key for p in k): v.shape for k, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
        got = {tuple(p.key for p in k): v.shape for k, v in
               jax.tree_util.tree_flatten_with_path(mapped)[0]}
        assert got == ref
        out = enc.apply(mapped, jnp.ones((1, 16, 16, 3)))
        assert out.shape == (1, 8, 8, 8)

    def test_decoder_roundtrip(self):
        dec = FlaxVAEDecoder(VCFG)
        params = dec.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)))
        sd = make_torch_sd(params, vae_dec_path_to_torch)
        mapped = L.map_vae_decoder_state(sd, VCFG)
        ref = {tuple(p.key for p in k): v.shape for k, v in
               jax.tree_util.tree_flatten_with_path(params)[0]}
        got = {tuple(p.key for p in k): v.shape for k, v in
               jax.tree_util.tree_flatten_with_path(mapped)[0]}
        assert got == ref
        out = dec.apply(mapped, jnp.ones((1, 8, 8, 4)))
        assert out.shape == (1, 16, 16, 3)


def controlnet_flax_path_to_torch(path):
    mod = path[0]
    m = re.match(r"cond_block_(\d+)$", mod)
    if m:
        return f"controlnet_cond_embedding.blocks.{m[1]}"
    if mod == "cond_in":
        return "controlnet_cond_embedding.conv_in"
    if mod == "cond_out":
        return "controlnet_cond_embedding.conv_out"
    m = re.match(r"ctrl_down_(\d+)$", mod)
    if m:
        return f"controlnet_down_blocks.{m[1]}"
    if mod == "ctrl_mid":
        return "controlnet_mid_block"
    return unet_flax_path_to_torch(path)


class TestControlNetMapping:
    def test_roundtrip_structure_and_values(self):
        from dreamscene_tpu.guidance.sd_flax import FlaxControlNet

        cn = FlaxControlNet(UCFG)  # downscale=8 like real SD
        params = cn.init(
            jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3, 16)),
            jnp.zeros((1, 64, 64, 3)),
        )
        sd = make_torch_sd(params, controlnet_flax_path_to_torch)
        mapped = L.map_controlnet_state(sd, UCFG)

        ref_paths = {
            tuple(p.key for p in k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        got_paths = {
            tuple(p.key for p in k): v.shape
            for k, v in jax.tree_util.tree_flatten_with_path(mapped)[0]
        }
        assert got_paths == ref_paths
        for (kp, v), (kp2, v2) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(mapped)[0],
        ):
            np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
        down, mid = cn.apply(mapped, jnp.ones((1, 8, 8, 4)),
                             jnp.asarray([5], jnp.int32), jnp.ones((1, 3, 16)),
                             jnp.ones((1, 64, 64, 3)))
        # one residual per UNet skip: 1 (conv_in) + sum(layers [+downsample])
        assert len(down) == 4 and mid.shape[-1] == UCFG.block_out_channels[-1]


class TestTextualInversion:
    def test_learned_embeds_extend_embedding_table(self, tmp_path):
        """Diffusers learned_embeds format must append token vectors to
        the CLIP embedding table and register the tokens (reference:
        pipe.load_textual_inversion, multitime_sd_utils.py:104-106)."""
        import torch

        d = 16
        path = tmp_path / "learned_embeds.bin"
        torch.save({"<thing>": torch.randn(d),
                    "<style>": torch.randn(2, d)}, str(path))

        class FakeTok:
            def __init__(self):
                self.added = []

            def add_tokens(self, names):
                self.added += names
                return len(names)

        class FakeModel:
            def __init__(self, vocab, d):
                self.params = {"text_model": {"embeddings": {
                    "token_embedding": {
                        "embedding": np.zeros((vocab, d), np.float32)}}}}

        tok, model = FakeTok(), FakeModel(100, d)
        L.load_textual_inversion(tok, model, str(path))
        table = np.asarray(
            model.params["text_model"]["embeddings"]["token_embedding"]
            ["embedding"])
        assert table.shape == (103, d)          # 1 + 2 new vectors
        assert tok.added == ["<thing>", "<style>", "<style>_1"]
        assert np.abs(table[100:]).sum() > 0    # real values appended
