"""Load a local diffusers Stable-Diffusion checkpoint into the Flax stack.

The reference loads torch/diffusers pipelines by model key
(reference: guidance/multitime_sd_utils.py:63-112). Zero-egress TPU pods
instead point `guidanceParams.model_key` at a *local directory* in
diffusers layout (model_index.json + unet/ vae/ text_encoder/ tokenizer/).
This module maps the PyTorch state dicts onto our Flax modules
(guidance/sd_flax.py):

  * torch Conv OIHW -> flax HWIO kernels; Linear [out,in] -> [in,out];
    GroupNorm/LayerNorm weight/bias -> scale/bias;
  * diffusers up_blocks[k] run at *descending* channel widths, our
    up_{i}_* names use ascending block indices: i = n_blocks-1-k;
  * the text encoder loads through transformers' FlaxCLIPTextModel
    (from_pt=True) with its tokenizer.

`build_sd_guidance` returns a ready MTSD; `map_unet_state/map_vae_state`
are exposed for tests, which verify the mapping round-trips through a
synthetic torch-layout state dict (real weights are not shippable here).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Mapping

import numpy as np
import jax.numpy as jnp

from dreamscene_tpu.guidance.sd_flax import UNetConfig, VAEConfig

logger = logging.getLogger("dreamscene_tpu")


# --------------------------------------------------------------------------
# torch <-> flax leaf conversion
# --------------------------------------------------------------------------

def _conv_kernel(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _dense_kernel(w):
    return np.transpose(np.asarray(w), (1, 0))


def _set(tree: dict, path: tuple, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = jnp.asarray(value)


def _norm(out, flax_path, sd, key):
    _set(out, flax_path + ("scale",), np.asarray(sd[key + ".weight"]))
    _set(out, flax_path + ("bias",), np.asarray(sd[key + ".bias"]))


def _conv(out, flax_path, sd, key):
    _set(out, flax_path + ("kernel",), _conv_kernel(sd[key + ".weight"]))
    if key + ".bias" in sd:
        _set(out, flax_path + ("bias",), np.asarray(sd[key + ".bias"]))


def _dense(out, flax_path, sd, key):
    _set(out, flax_path + ("kernel",), _dense_kernel(sd[key + ".weight"]))
    if key + ".bias" in sd:
        _set(out, flax_path + ("bias",), np.asarray(sd[key + ".bias"]))


def _resnet(out, prefix: str, sd, key: str, has_shortcut: bool):
    _norm(out, (prefix, "norm1"), sd, key + ".norm1")
    _conv(out, (prefix, "conv1"), sd, key + ".conv1")
    _dense(out, (prefix, "time_emb_proj"), sd, key + ".time_emb_proj")
    _norm(out, (prefix, "norm2"), sd, key + ".norm2")
    _conv(out, (prefix, "conv2"), sd, key + ".conv2")
    if has_shortcut:
        _conv(out, (prefix, "conv_shortcut"), sd, key + ".conv_shortcut")


def _attn_inner(out, base: tuple, sd, key: str):
    _dense(out, base + ("to_q",), sd, key + ".to_q")
    _dense(out, base + ("to_k",), sd, key + ".to_k")
    _dense(out, base + ("to_v",), sd, key + ".to_v")
    _dense(out, base + ("to_out_0",), sd, key + ".to_out.0")


def _spatial_transformer(out, prefix: str, sd, key: str):
    _norm(out, (prefix, "norm"), sd, key + ".norm")
    # proj_in/out: SD2 linear [out,in]; SD1 conv1x1 [O,I,1,1]
    w = np.asarray(sd[key + ".proj_in.weight"])
    pin = _dense_kernel(w) if w.ndim == 2 else _dense_kernel(w[:, :, 0, 0])
    _set(out, (prefix, "proj_in", "kernel"), pin)
    _set(out, (prefix, "proj_in", "bias"), np.asarray(sd[key + ".proj_in.bias"]))
    w = np.asarray(sd[key + ".proj_out.weight"])
    pout = _dense_kernel(w) if w.ndim == 2 else _dense_kernel(w[:, :, 0, 0])
    _set(out, (prefix, "proj_out", "kernel"), pout)
    _set(out, (prefix, "proj_out", "bias"), np.asarray(sd[key + ".proj_out.bias"]))
    tb = key + ".transformer_blocks.0"
    base = (prefix, "transformer_blocks_0")
    _attn_inner(out, base + ("attn1",), sd, tb + ".attn1")
    _attn_inner(out, base + ("attn2",), sd, tb + ".attn2")
    for n in ("norm1", "norm2", "norm3"):
        _norm(out, base + (n,), sd, f"{tb}.{n}")
    _dense(out, base + ("ff", "net_0_proj"), sd, tb + ".ff.net.0.proj")
    _dense(out, base + ("ff", "net_2"), sd, tb + ".ff.net.2")


def map_unet_state(sd: Mapping[str, np.ndarray], cfg: UNetConfig) -> dict:
    """diffusers UNet2DConditionModel torch state dict -> flax params."""
    out: dict = {}
    _conv(out, ("conv_in",), sd, "conv_in")
    _dense(out, ("time_embedding_linear_1",), sd, "time_embedding.linear_1")
    _dense(out, ("time_embedding_linear_2",), sd, "time_embedding.linear_2")

    n_blocks = len(cfg.block_out_channels)
    prev_ch = cfg.block_out_channels[0]
    for i, ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            in_ch = prev_ch if j == 0 else ch
            _resnet(out, f"down_{i}_res_{j}", sd,
                    f"down_blocks.{i}.resnets.{j}", in_ch != ch)
            if cfg.with_cross_attn[i]:
                _spatial_transformer(out, f"down_{i}_attn_{j}", sd,
                                     f"down_blocks.{i}.attentions.{j}")
        if i < n_blocks - 1:
            _conv(out, (f"down_{i}_downsample",), sd,
                  f"down_blocks.{i}.downsamplers.0.conv")
        prev_ch = ch

    _resnet(out, "mid_res_0", sd, "mid_block.resnets.0", False)
    _spatial_transformer(out, "mid_attn", sd, "mid_block.attentions.0")
    _resnet(out, "mid_res_1", sd, "mid_block.resnets.1", False)

    # diffusers up_blocks[k] <-> our up_{n_blocks-1-k}
    for k in range(n_blocks):
        i = n_blocks - 1 - k
        for j in range(cfg.layers_per_block + 1):
            _resnet(out, f"up_{i}_res_{j}", sd,
                    f"up_blocks.{k}.resnets.{j}", True)
            if cfg.with_cross_attn[i]:
                _spatial_transformer(out, f"up_{i}_attn_{j}", sd,
                                     f"up_blocks.{k}.attentions.{j}")
        if i > 0:
            _conv(out, (f"up_{i}_upsample",), sd,
                  f"up_blocks.{k}.upsamplers.0.conv")

    _norm(out, ("conv_norm_out",), sd, "conv_norm_out")
    _conv(out, ("conv_out",), sd, "conv_out")
    return {"params": out}


def map_controlnet_state(sd: Mapping[str, np.ndarray],
                         cfg: UNetConfig) -> dict:
    """diffusers ControlNetModel torch state dict -> FlaxControlNet
    params (guidance/sd_flax.py). Mirrors map_unet_state for the shared
    encoder trunk; adds the conditioning embedding + zero convs."""
    out: dict = {}
    _conv(out, ("conv_in",), sd, "conv_in")
    _dense(out, ("time_embedding_linear_1",), sd, "time_embedding.linear_1")
    _dense(out, ("time_embedding_linear_2",), sd, "time_embedding.linear_2")

    emb = "controlnet_cond_embedding"
    _conv(out, ("cond_in",), sd, f"{emb}.conv_in")
    for k in range(6):
        _conv(out, (f"cond_block_{k}",), sd, f"{emb}.blocks.{k}")
    _conv(out, ("cond_out",), sd, f"{emb}.conv_out")

    n_blocks = len(cfg.block_out_channels)
    prev_ch = cfg.block_out_channels[0]
    zc = 1
    _conv(out, ("ctrl_down_0",), sd, "controlnet_down_blocks.0")
    for i, ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            in_ch = prev_ch if j == 0 else ch
            _resnet(out, f"down_{i}_res_{j}", sd,
                    f"down_blocks.{i}.resnets.{j}", in_ch != ch)
            if cfg.with_cross_attn[i]:
                _spatial_transformer(out, f"down_{i}_attn_{j}", sd,
                                     f"down_blocks.{i}.attentions.{j}")
            _conv(out, (f"ctrl_down_{zc}",), sd,
                  f"controlnet_down_blocks.{zc}")
            zc += 1
        if i < n_blocks - 1:
            _conv(out, (f"down_{i}_downsample",), sd,
                  f"down_blocks.{i}.downsamplers.0.conv")
            _conv(out, (f"ctrl_down_{zc}",), sd,
                  f"controlnet_down_blocks.{zc}")
            zc += 1
        prev_ch = ch

    _resnet(out, "mid_res_0", sd, "mid_block.resnets.0", False)
    _spatial_transformer(out, "mid_attn", sd, "mid_block.attentions.0")
    _resnet(out, "mid_res_1", sd, "mid_block.resnets.1", False)
    _conv(out, ("ctrl_mid",), sd, "controlnet_mid_block")
    return {"params": out}


def _vae_resnet(out, prefix: str, sd, key: str, has_shortcut: bool):
    _norm(out, (prefix, "norm1"), sd, key + ".norm1")
    _conv(out, (prefix, "conv1"), sd, key + ".conv1")
    _norm(out, (prefix, "norm2"), sd, key + ".norm2")
    _conv(out, (prefix, "conv2"), sd, key + ".conv2")
    if has_shortcut:
        _conv(out, (prefix, "conv_shortcut"), sd, key + ".conv_shortcut")


def _vae_mid(out, sd, base: str):
    _vae_resnet(out, "mid_res_0", sd, base + ".mid_block.resnets.0", False)
    attn = base + ".mid_block.attentions.0"
    _norm(out, ("mid_attn", "group_norm"), sd, attn + ".group_norm")
    _dense(out, ("mid_attn", "to_q"), sd, attn + ".to_q")
    _dense(out, ("mid_attn", "to_k"), sd, attn + ".to_k")
    _dense(out, ("mid_attn", "to_v"), sd, attn + ".to_v")
    _dense(out, ("mid_attn", "to_out_0"), sd, attn + ".to_out.0")
    _vae_resnet(out, "mid_res_1", sd, base + ".mid_block.resnets.1", False)


def map_vae_encoder_state(sd: Mapping[str, np.ndarray], cfg: VAEConfig) -> dict:
    out: dict = {}
    _conv(out, ("conv_in",), sd, "encoder.conv_in")
    prev = cfg.block_out_channels[0]
    for i, ch in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            in_ch = prev if j == 0 else ch
            _vae_resnet(out, f"down_{i}_res_{j}", sd,
                        f"encoder.down_blocks.{i}.resnets.{j}", in_ch != ch)
        if i < len(cfg.block_out_channels) - 1:
            _conv(out, (f"down_{i}_downsample",), sd,
                  f"encoder.down_blocks.{i}.downsamplers.0.conv")
        prev = ch
    _vae_mid(out, sd, "encoder")
    _norm(out, ("conv_norm_out",), sd, "encoder.conv_norm_out")
    _conv(out, ("conv_out",), sd, "encoder.conv_out")
    _conv(out, ("quant_conv",), sd, "quant_conv")
    return {"params": out}


def map_vae_decoder_state(sd: Mapping[str, np.ndarray], cfg: VAEConfig) -> dict:
    out: dict = {}
    _conv(out, ("post_quant_conv",), sd, "post_quant_conv")
    _conv(out, ("conv_in",), sd, "decoder.conv_in")
    _vae_mid(out, sd, "decoder")
    n_blocks = len(cfg.block_out_channels)
    # decoder up_blocks[k] run from the widest block down: k <-> i=n-1-k
    for k in range(n_blocks):
        i = n_blocks - 1 - k
        ch = cfg.block_out_channels[i]
        prev = cfg.block_out_channels[min(i + 1, n_blocks - 1)]
        for j in range(cfg.layers_per_block + 1):
            in_ch = prev if j == 0 else ch
            _vae_resnet(out, f"up_{i}_res_{j}", sd,
                        f"decoder.up_blocks.{k}.resnets.{j}", in_ch != ch)
        if i > 0:
            _conv(out, (f"up_{i}_upsample",), sd,
                  f"decoder.up_blocks.{k}.upsamplers.0.conv")
    _norm(out, ("conv_norm_out",), sd, "decoder.conv_norm_out")
    _conv(out, ("conv_out",), sd, "decoder.conv_out")
    return {"params": out}


# --------------------------------------------------------------------------
# checkpoint IO
# --------------------------------------------------------------------------

def load_torch_state(folder: str) -> dict:
    """Read a diffusers sub-model's torch weights (safetensors or bin)."""
    for name in ("diffusion_pytorch_model.safetensors",
                 "model.safetensors"):
        p = os.path.join(folder, name)
        if os.path.exists(p):
            from safetensors.numpy import load_file

            return dict(load_file(p))
    for name in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
        p = os.path.join(folder, name)
        if os.path.exists(p):
            import torch

            return {
                k: v.numpy() for k, v in torch.load(
                    p, map_location="cpu", weights_only=True
                ).items()
            }
    raise FileNotFoundError(f"no weights found in {folder}")


def build_sd_guidance(model_dir: str, guidance_opt, height: int = 512,
                      width: int = 512):
    """Local diffusers checkpoint dir -> MTSD with real weights."""
    import jax

    from dreamscene_tpu.guidance import mtsd
    from dreamscene_tpu.guidance.sd_flax import (
        FlaxUNet2DCondition,
        FlaxVAEDecoder,
        FlaxVAEEncoder,
    )
    from dreamscene_tpu.ops.ddim import make_schedule

    with open(os.path.join(model_dir, "unet", "config.json")) as f:
        ucfg_json = json.load(f)
    cross_dim = ucfg_json.get("cross_attention_dim", 768)
    head_dim = ucfg_json.get("attention_head_dim", 8)
    if isinstance(head_dim, list):
        ucfg = UNetConfig(
            cross_attention_dim=cross_dim,
            block_out_channels=tuple(ucfg_json["block_out_channels"]),
            attention_head_dim=head_dim[0]
            if all(h == head_dim[0] for h in head_dim) else 64,
        )
    elif head_dim <= 16:  # SD1.x convention: head COUNT
        ucfg = UNetConfig(cross_attention_dim=cross_dim,
                          block_out_channels=tuple(ucfg_json["block_out_channels"]),
                          num_attention_heads=head_dim)
    else:
        ucfg = UNetConfig(cross_attention_dim=cross_dim,
                          block_out_channels=tuple(ucfg_json["block_out_channels"]),
                          attention_head_dim=head_dim)
    vcfg = VAEConfig()

    unet = FlaxUNet2DCondition(ucfg)
    enc = FlaxVAEEncoder(vcfg)
    dec = FlaxVAEDecoder(vcfg)
    unet_params = map_unet_state(
        load_torch_state(os.path.join(model_dir, "unet")), ucfg
    )
    vae_sd = load_torch_state(os.path.join(model_dir, "vae"))
    enc_params = map_vae_encoder_state(vae_sd, vcfg)
    dec_params = map_vae_decoder_state(vae_sd, vcfg)

    sched_cfg = {}
    sched_path = os.path.join(model_dir, "scheduler",
                              "scheduler_config.json")
    if os.path.exists(sched_path):
        with open(sched_path) as f:
            sched_cfg = json.load(f)
    schedule = make_schedule(
        num_train_timesteps=sched_cfg.get("num_train_timesteps", 1000),
        beta_start=sched_cfg.get("beta_start", 0.00085),
        beta_end=sched_cfg.get("beta_end", 0.012),
        beta_schedule=sched_cfg.get("beta_schedule", "scaled_linear"),
        prediction_type=sched_cfg.get("prediction_type", "epsilon"),
        set_alpha_to_one=sched_cfg.get("set_alpha_to_one", False),
    )

    # optional depth ControlNet (guidanceParams.controlnet_model_key
    # points at a local diffusers ControlNetModel dir; reference loads
    # lllyasviel/sd-controlnet-depth, multitime_sd_utils.py:88-91)
    cn_apply = cn_params = None
    cn_dir = getattr(guidance_opt, "controlnet_model_key", None)
    if cn_dir and os.path.isdir(cn_dir):
        from dreamscene_tpu.guidance.sd_flax import FlaxControlNet

        cn = FlaxControlNet(ucfg)
        cn_params = map_controlnet_state(load_torch_state(cn_dir), ucfg)
        cn_apply = cn.apply
        logger.info("loaded depth ControlNet from %s", cn_dir)

    mods = mtsd.GuidanceModules(
        unet_apply=unet.apply,
        unet_params=unet_params,
        vae_encode=enc.apply,
        vae_encode_params=enc_params,
        vae_decode=dec.apply,
        vae_decode_params=dec_params,
        scaling_factor=0.18215,
        schedule=schedule,
        downscale=8,
        controlnet_apply=cn_apply,
        controlnet_params=cn_params,
    )

    text_encode = make_clip_text_encoder(
        model_dir,
        textual_inversion_path=getattr(
            guidance_opt, "textual_inversion_path", None),
    )
    return mtsd.MTSD(mods=mods, text_encode=text_encode,
                     guidance_opt=guidance_opt)


def load_textual_inversion(tok, model, path: str) -> None:
    """Load learned-embedding tokens into the tokenizer + Flax CLIP
    encoder (reference: pipe.load_textual_inversion,
    guidance/multitime_sd_utils.py:104-106). Accepts the diffusers
    learned_embeds.bin / .safetensors format ({token: [n, D]} or the
    {"string_to_param": {"*": [n, D]}} A1111 variant); multi-vector
    tokens expand to `tok`, `tok_1`, ... like diffusers."""
    import jax.numpy as _jnp

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
              for k, v in torch.load(path, map_location="cpu",
                                     weights_only=False).items()}
    if "string_to_param" in sd:
        sd = {"*": np.asarray(list(sd["string_to_param"].values())[0])}

    emb_path = ("text_model", "embeddings", "token_embedding", "embedding")
    params = model.params
    node = params
    for k in emb_path[:-1]:
        node = node[k]
    table = np.asarray(node[emb_path[-1]])

    rows = [table]
    for token, vec in sd.items():
        vec = np.asarray(vec, np.float32)
        if vec.ndim == 1:
            vec = vec[None]
        names = [token] + [f"{token}_{i}" for i in range(1, vec.shape[0])]
        added = tok.add_tokens(names)
        assert added == len(names), (token, added)
        rows.append(vec)
        logger.info("textual inversion: +%d vectors for %r",
                    vec.shape[0], token)
    node[emb_path[-1]] = _jnp.asarray(np.concatenate(rows, axis=0))
    model.params = params


def make_clip_text_encoder(model_dir: str,
                           textual_inversion_path: str | None = None):
    """CLIP text encoder via transformers Flax (from_pt), with tokenizer.
    Returns encode(list[str]) -> [B, 77, D]."""
    from transformers import CLIPTokenizer, FlaxCLIPTextModel

    tok = CLIPTokenizer.from_pretrained(os.path.join(model_dir, "tokenizer"))
    model = FlaxCLIPTextModel.from_pretrained(
        os.path.join(model_dir, "text_encoder"), from_pt=True
    )
    if textual_inversion_path:
        load_textual_inversion(tok, model, textual_inversion_path)

    def encode(prompts):
        inputs = tok(prompts, padding="max_length",
                     max_length=tok.model_max_length, truncation=True,
                     return_tensors="np")
        return model(input_ids=inputs.input_ids)[0]

    return encode
