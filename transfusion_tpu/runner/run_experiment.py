"""Config-driven experiment launcher (CLI).

Public API mirror of the reference launcher (``runner/run_experiment.py``):

    python -m transfusion_tpu.runner.run_experiment \
        --config $CODE/runner/nao/configs/ego_nao_res50_ego4dv2.yml \
        [--debug] [--run-val] [--run-test] [--resume-from PATH] [--epochs N]

The existing reference YAMLs run unmodified (``${CODE}``/``${DATA}``/
``${RUNS}`` interpolation included). wandb logging is optional: when the
package is importable and WANDB_MODE isn't disabled, scalars/artifacts are
mirrored there; the JSONL history + challenge JSONs in the run dir are the
system of record either way.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run experiments.")
    p.add_argument("--config", type=str, required=True, help="run config YAML")
    p.add_argument("--debug", action="store_true", default=False,
                   help="reduced samples + small batch end-to-end check")
    p.add_argument("--resume-from", type=str, default="",
                   help="checkpoint directory, or wandb run id[:vN] / URL "
                        "(downloads the model artifact)")
    p.add_argument("--run-test", action="store_true", default=False)
    p.add_argument("--run-val", action="store_true", default=False)
    p.add_argument("--epochs", type=int, default=None, help="override run.epochs")
    p.add_argument("--devices", type=int, default=None,
                   help="use only the first N local devices (the TPU analog "
                        "of the reference's --gpu list; omit to use all)")
    p.add_argument("--skip-ssl-verification", action="store_true", default=False,
                   help="disable SSL certificate verification for wandb "
                        "artifact downloads (reference run_experiment.py:307-310)")
    p.add_argument("--run-dir", type=str, default=None,
                   help="output directory (default: $RUNS/<experiment>/<timestamp>)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="model-parallel axis size (data axis uses the rest)")
    p.add_argument("--mesh-fsdp", action="store_true", default=False,
                   help="ZeRO-3-style fully-sharded data parallelism: large "
                        "params + optimizer moments shard over the data axis "
                        "(XLA all-gathers on use, reduce-scatters grads)")
    p.add_argument("--do-not-log-checkpoints", action="store_true", default=False,
                   help="skip uploading per-epoch checkpoint artifacts to wandb")
    p.add_argument("--distributed", action="store_true", default=False,
                   help="call jax.distributed.initialize() for multi-host runs "
                        "(also triggered by TRANSFUSION_DISTRIBUTED=1)")
    p.add_argument("--wandb-entity", default=None)
    p.add_argument("--wandb-project", default="transfusion-tpu")
    return p


def make_run_dir(experiment: str, override: str | None) -> str:
    if override:
        os.makedirs(override, exist_ok=True)
        return override
    base = os.path.expandvars("$RUNS") if os.environ.get("RUNS") else "runs"
    run_dir = os.path.join(base, experiment, time.strftime("%Y%m%d_%H%M%S"))
    os.makedirs(run_dir, exist_ok=True)
    return run_dir


def maybe_wandb(config: dict, args) -> object | None:
    try:
        import wandb
    except ImportError:
        return None
    if config.get("debug") and not config.get("force_wandb_logging"):
        return None
    return wandb.init(
        project=args.wandb_project, entity=args.wandb_entity, config=dict(config)
    )


def main(argv=None):
    args = get_parser().parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # Honor JAX_PLATFORMS even when a site hook pre-imported jax with a
        # hardware platform already registered (env vars are only read at
        # import time): a user running CPU-only must never block on — or
        # claim — an attached accelerator.
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    if os.environ.get("TRANSFUSION_RNG", "rbg") == "rbg":
        # TPU hardware RNG for dropout/sampling keys (~5 ms/step cheaper than
        # threefry mask fusions at flagship shapes; same distributions).
        jax.config.update("jax_default_prng_impl", "rbg")

    if args.distributed or os.environ.get("TRANSFUSION_DISTRIBUTED") == "1":
        # Multi-host entry: one process per host over DCN, auto-detected
        # coordinator on TPU pods (the jax-native replacement for the
        # reference's PL DDP process group, run_experiment.py:452-453).
        jax.distributed.initialize()

    if args.skip_ssl_verification:
        # Same mechanism as the reference (run_experiment.py:307-310): clusters
        # with intercepting proxies otherwise fail the wandb artifact fetch.
        import ssl

        ssl._create_default_https_context = ssl._create_unverified_context

    from transfusion_tpu.config import derive_config, load_config
    from transfusion_tpu.parallel.mesh import make_mesh
    from transfusion_tpu.runner.trainer import EgoNaoTrainer

    config = load_config(args.config)
    if config.get("experiment") != "egonao":
        raise NotImplementedError(f"experiment {config.get('experiment')!r} (only egonao is wired)")
    config = derive_config(config, {"debug": args.debug, "resume_from": args.resume_from})
    if args.run_test:
        config["run"]["run_test"] = True
    if args.run_val:
        config["run"]["run_val"] = True

    run_dir = make_run_dir(config["experiment"], args.run_dir)
    with open(os.path.join(run_dir, "config.json"), "w") as fp:
        json.dump(dict(config), fp, default=str, indent=1)
    # ${run_dir}/run.log mirrors everything the root logger emits (the
    # reference's get_logger file handler, runner/utils/cfg_utils.py:20-34):
    # a killed terminal keeps the log history.jsonl doesn't carry.
    fh = logging.FileHandler(os.path.join(run_dir, "run.log"))
    fh.setFormatter(logging.Formatter("%(asctime)s %(name)s %(message)s"))
    logging.getLogger().addHandler(fh)
    logging.info("run dir: %s", run_dir)

    wb = maybe_wandb(config, args)
    if wb is not None:
        # Config artifact at run start (the reference logs configs + code as
        # artifacts, run_experiment.py:312-327).
        import wandb

        art = wandb.Artifact(f"config-{wb.id}", type="config")
        art.add_file(os.path.join(run_dir, "config.json"))
        wb.log_artifact(art)
    devices = jax.devices()[: args.devices] if args.devices else None
    mesh = make_mesh(model=args.mesh_model, devices=devices)
    trainer = EgoNaoTrainer(config, run_dir, debug=config["debug"], mesh=mesh,
                            fsdp=args.mesh_fsdp)

    # Local path, or wandb id[:vN] / URL artifact download
    # (run_experiment.py:188-253).
    from transfusion_tpu.runner.wandb_resume import resolve_resume

    resume = resolve_resume(
        args.resume_from or None, run_dir, args.wandb_entity, args.wandb_project
    )
    if config["run"].get("run_test"):
        trainer.ensure_state(resume)
        result = trainer.evaluate(0, dataset=trainer.test_ds, source="test")
        print(json.dumps(result.metrics, indent=1))
    elif config["run"].get("run_val"):
        trainer.ensure_state(resume)
        result = trainer.evaluate(0, source="val")
        print(json.dumps(result.metrics, indent=1))
    else:
        # Scalars log live per epoch and checkpoints upload as model-<id>
        # artifacts inside fit (a killed run keeps everything logged so far —
        # unlike a post-hoc replay).
        history = trainer.fit(
            epochs=args.epochs, resume_from=resume, wandb_run=wb,
            log_checkpoints=not args.do_not_log_checkpoints,
        )
        print(json.dumps(history[-1] if history else {}, indent=1))
    if wb is not None:
        wb.finish()


if __name__ == "__main__":
    main()
