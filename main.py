"""CLI entry: `python main.py [--object] --config cfg.yaml [a.b=c ...]`
(reference: main.py:9-30 — same flags, same three-level config merge)."""

import argparse
import logging

from dreamscene_tpu.utils.config import load_config


def main():
    parser = argparse.ArgumentParser(description="DreamScene-TPU")
    parser.add_argument("--object", action="store_true",
                        help="single-object generation mode")
    parser.add_argument("--config", required=True, help="YAML config path")
    parser.add_argument("overrides", nargs="*",
                        help="dotlist overrides, e.g. seed=1")
    args = parser.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
    )

    # multi-host runtime (no-op single-process; JAX_NUM_PROCESSES /
    # JAX_COORDINATOR_ADDRESS bring up jax.distributed BEFORE any device
    # use — parallel/distributed.py)
    from dreamscene_tpu.parallel.distributed import initialize_runtime

    initialize_runtime()

    cfg = load_config(args.config, args.overrides, object_mode=args.object)
    if args.object:
        from dreamscene_tpu.training.object_trainer import ObjectTrainer

        ObjectTrainer(cfg).train()
    else:
        from dreamscene_tpu.training.scene_trainer import SceneTrainer

        SceneTrainer(cfg).train()


if __name__ == "__main__":
    main()
