"""One-command SD-weights validation harness.

    python -m dreamscene_tpu.guidance.validate --model_key /path/to/sd21
    python -m dreamscene_tpu.guidance.validate --tiny        # CI smoke

The diffusers->Flax mapping (guidance/sd_loader.py) is structurally
round-trip tested in CI, but no SD checkpoint ships in the build
container — this harness is the moment-of-truth check to run wherever a
checkpoint directory exists (reference behavior being validated:
guidance/multitime_sd_utils.py:63-112 load + train_step ladder).

It writes to --out (default sd_validation/):
  * decode_probe.jpg    — VAE-decoded seeded latent (should look like
                          colorful low-frequency blobs, NOT noise/NaNs)
  * roundtrip.jpg       — image -> VAE encode -> decode (gradient test
                          card; expect PSNR > 20 dB for real SD weights)
  * ladder_grid.jpg     — rendered-image guidance step: latent-RGB
                          preview, |CSD grad| heatmap, per-rung decoded
                          x0-hat (reference viz contract,
                          multitime_sd_utils.py:291-337)
  * report.json         — numerics: PSNR, grad norms, bf16-vs-fp32 UNet
                          max/mean deltas, NaN counts

Expected for real SD2.1-base: roundtrip_psnr_db >= 20, unet bf16 deltas
mean <~2e-2 (bf16 rounding), zero NaNs, x0-hat images showing the prompt.
Random tiny weights (CI): finite numbers, shapes, files written.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def _test_card(h, w):
    """Smooth gradient + circle test image [1,3,h,w] in [0,1]."""
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    r = np.sqrt((x / w - 0.5) ** 2 + (y / h - 0.5) ** 2)
    img = np.stack([x / w, y / h, (r < 0.3).astype(np.float32)], 0)
    return img[None]


def run_validation(guidance, out_dir: str, size: int = 512,
                   prompt: str = "a photo of a red apple on a table",
                   check_bf16: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from dreamscene_tpu.guidance import mtsd
    from dreamscene_tpu.utils.media import save_image_grid

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    mods = guidance.mods
    f = mods.downscale
    report: dict = {}

    # 1. decode a seeded latent
    key = jax.random.key(0)
    lat = jax.random.normal(key, (1, size // f, size // f, 4))
    dec = mtsd.decode_latents(mods, lat)
    report["decode_finite"] = bool(np.isfinite(np.asarray(dec)).all())
    save_image_grid(str(out / "decode_probe.jpg"), [np.asarray(dec[0])])

    # 2. encode->decode round trip
    img = jnp.asarray(_test_card(size, size))
    lat2 = mtsd.encode_images(mods, img, jax.random.key(1))
    rec = mtsd.decode_latents(mods, lat2)
    report["roundtrip_psnr_db"] = _psnr(rec, img)
    save_image_grid(str(out / "roundtrip.jpg"),
                    [np.asarray(img[0]), np.asarray(rec[0])])

    # 3. one guidance ladder on the test card (train_step numerics)
    text = guidance.get_text_embeds([prompt, "", ""])
    ladder = guidance.sample_ladder(0.0)
    if len(ladder) == 0:        # degenerate config: walk one t=0 rung
        ladder = [0]
    noise = mtsd.make_ladder_noise(jax.random.key(2), lat2.shape)
    scores = mtsd.ladder_scores(
        mods, jax.lax.stop_gradient(lat2), noise,
        jnp.asarray(ladder, jnp.int32), text, n_rungs=len(ladder),
    )
    grad = mtsd.csd_grad(mods, scores, guidance_scale=7.5)
    report["csd_grad_norm"] = float(jnp.linalg.norm(grad))
    report["csd_grad_nan"] = int(jnp.sum(~jnp.isfinite(grad)))
    rows = mtsd.guidance_viz_grid(
        mods, img, jnp.zeros(img.shape[-2:]), jnp.ones(img.shape[-2:]),
        lat2, grad, scores, guidance_scale=7.5,
    )
    save_image_grid(str(out / "ladder_grid.jpg"), rows)

    # 4. bf16-vs-fp32 UNet numerics delta on one call
    if check_bf16:
        t_b = jnp.full((3,), 500, jnp.int32)
        inp = jnp.concatenate([lat2] * 3, axis=0)
        eps_lo = mods.unet_apply(mods.unet_params, inp, t_b, text)
        eps_hi = jnp.asarray(
            mods.unet_apply(
                jax.tree.map(
                    lambda x: x.astype(jnp.float32)
                    if hasattr(x, "astype") else x,
                    mods.unet_params,
                ),
                inp.astype(jnp.float32), t_b, text.astype(jnp.float32),
            )
        )
        d = jnp.abs(eps_lo - eps_hi)
        report["unet_bf16_delta_max"] = float(jnp.max(d))
        report["unet_bf16_delta_mean"] = float(jnp.mean(d))

    with open(out / "report.json", "w") as fjson:
        json.dump(report, fjson, indent=2)
    return report


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model_key", type=str, default=None,
                    help="local diffusers checkpoint dir")
    ap.add_argument("--tiny", action="store_true",
                    help="random tiny stack (CI smoke, no weights needed)")
    ap.add_argument("--out", type=str, default="sd_validation")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--prompt", type=str,
                    default="a photo of a red apple on a table")
    args = ap.parse_args()

    from dreamscene_tpu.utils.config import GuidanceParams

    gp = GuidanceParams()
    if args.model_key:
        from dreamscene_tpu.guidance.sd_loader import build_sd_guidance

        gp.model_key = args.model_key
        guidance = build_sd_guidance(args.model_key, gp,
                                     height=args.size, width=args.size)
    elif args.tiny:
        from dreamscene_tpu.guidance import mtsd

        guidance = mtsd.make_tiny_guidance(gp, downscale=8)
    else:
        raise SystemExit("pass --model_key <dir> or --tiny")

    report = run_validation(guidance, args.out, size=args.size,
                            prompt=args.prompt)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
