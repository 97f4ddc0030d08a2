"""Optional point-e text->point-cloud initializer.

The reference shells out to the external `point-e` torch model
(reference: utils/pointe_utils.py:13-73, base40M-textvec + upsampler,
optional Cap3D-finetuned checkpoints). point-e is an optional external
dependency; when it (or its weights) is unavailable the object initializer
falls back to the ball init and the prompt-hashed PLY cache
(models/init.py) — the same cache the reference uses, so a cloud generated
elsewhere can be dropped into the experiment directory.
"""

from __future__ import annotations

import numpy as np

POINTE_MODELS = {
    "pointe": "base40M-textvec",
    "pointe_330k": "pointE_FT_330k",   # Cap3D finetune (reference: 33-46)
    "pointe_825k": "pointE_FT_825k",
}


def init_from_pointe(prompt: str, variant: str = "pointe"):
    """text -> (xyz [4096,3], rgb [4096,3] in [0,1]).

    Requires the `point_e` package + checkpoints; raises ImportError when
    absent (callers fall back to the ball initializer).
    """
    import torch  # noqa
    from point_e.diffusion.configs import DIFFUSION_CONFIGS, diffusion_from_config
    from point_e.diffusion.sampler import PointCloudSampler
    from point_e.models.configs import MODEL_CONFIGS, model_from_config
    from point_e.models.download import load_checkpoint

    device = torch.device("cpu")
    base_name = "base40M-textvec"
    base_model = model_from_config(MODEL_CONFIGS[base_name], device)
    base_model.eval()
    base_diffusion = diffusion_from_config(DIFFUSION_CONFIGS[base_name])
    upsampler_model = model_from_config(MODEL_CONFIGS["upsample"], device)
    upsampler_model.eval()
    upsampler_diffusion = diffusion_from_config(DIFFUSION_CONFIGS["upsample"])
    base_model.load_state_dict(load_checkpoint(base_name, device))
    upsampler_model.load_state_dict(load_checkpoint("upsample", device))

    sampler = PointCloudSampler(
        device=device,
        models=[base_model, upsampler_model],
        diffusions=[base_diffusion, upsampler_diffusion],
        num_points=[1024, 4096 - 1024],
        aux_channels=["R", "G", "B"],
        guidance_scale=[3.0, 0.0],
        model_kwargs_key_filter=("texts", ""),
    )
    samples = None
    for x in sampler.sample_batch_progressive(
        batch_size=1, model_kwargs=dict(texts=[prompt])
    ):
        samples = x
    pc = sampler.output_to_point_clouds(samples)[0]
    xyz = np.asarray(pc.coords, np.float32)
    rgb = np.stack(
        [pc.channels["R"], pc.channels["G"], pc.channels["B"]], axis=1
    ).astype(np.float32)
    return xyz, rgb
