"""``cpsd reproduce`` — manifest-driven full-matrix orchestration.

The reference runs its paper as a SLURM job array over patients x
strategies x contexts (`/root/reference/README.md:27`: one sbatch per
script, each parameterized by ``-pt``/``-a``/... flags, e.g.
`aligned_decode_svm_ncv.py:114-120`). This module is the TPU-native
equivalent: one manifest YAML expands into a sequenced list of driver
invocations on the local chip/mesh, with cross-matrix resume — jobs
whose incremental result pickles already contain ``n_iter`` iterations
are skipped outright, partially-complete jobs resume mid-way through the
per-driver ``_completed_results`` machinery, so the whole matrix can be
killed and relaunched at any point.

See :class:`~cross_patient_speech_decoding_tpu.utils.config.ReproduceConfig`
for the manifest format; ``manifests/paper.yaml`` encodes the full
reference experiment grid.
"""

from __future__ import annotations

import itertools
import time
from dataclasses import fields, replace as dataclasses_replace
from pathlib import Path

from cross_patient_speech_decoding_tpu.utils.config import (
    ReproduceConfig,
    config_from_values,
)


def _resolve_command(command: str):
    """(cfg_cls, driver_fn) for a manifest job's command name."""
    from cross_patient_speech_decoding_tpu.cli import (
        experiments,
        subsample_experiments,
    )
    from cross_patient_speech_decoding_tpu.cli.main import _COMMANDS

    if command not in _COMMANDS or command == "reproduce":
        raise KeyError(
            f"unknown manifest command {command!r}; "
            f"available: {sorted(c for c in _COMMANDS if c != 'reproduce')}"
        )
    cfg_cls, fn_name = _COMMANDS[command]
    for mod in (experiments, subsample_experiments):
        if hasattr(mod, fn_name):
            return cfg_cls, getattr(mod, fn_name)
    raise AttributeError(fn_name)  # pragma: no cover - table/module drift


def expand_manifest(manifest: dict) -> list[dict]:
    """Expand a manifest dict into a flat job list.

    Each entry: ``{"command", "values", "soft_keys", "label"}`` with
    ``values`` the fully-merged (defaults <- job overrides <- matrix
    point) dict and every string value ``str.format``-ed with the merged
    dict, so ``out: results/{target_pt}_{strategy}.pkl`` templates
    resolve. ``soft_keys`` are the keys that came ONLY from ``defaults``
    — those are dropped for commands whose config lacks the field (a
    shared ``data: synthetic`` default must not crash ``realtime-sim``),
    while job-level ``overrides``/``matrix`` keys stay strict (typos in
    a 50-job matrix must fail loudly, before any TPU time is spent).
    """
    defaults = dict(manifest.get("defaults") or {})
    jobs = manifest.get("jobs")
    if not jobs:
        raise ValueError("manifest has no jobs")
    out = []
    for j, job in enumerate(jobs):
        if "command" not in job:
            raise ValueError(f"job #{j} missing 'command'")
        command = job["command"]
        overrides = dict(job.get("overrides") or {})
        matrix = dict(job.get("matrix") or {})
        for k, vs in matrix.items():
            if not isinstance(vs, (list, tuple)):
                raise ValueError(
                    f"job #{j} matrix key {k!r} must be a list, got {vs!r}")
        keys = list(matrix)
        for combo in itertools.product(*(matrix[k] for k in keys)) if keys \
                else [()]:
            point = dict(zip(keys, combo))
            values = {**defaults, **overrides, **point}
            soft = set(defaults) - set(overrides) - set(point)
            # iterate until stable: a templated value may reference another
            # value that is itself templated (e.g. a default out-dir built
            # from a templated run name); a single pass against a snapshot
            # would bake in the unexpanded intermediate. Bounded passes so
            # a self-referencing template fails loudly instead of spinning.
            for _ in range(8):
                changed = False
                for k, v in values.items():
                    if isinstance(v, str) and "{" in v:
                        new = v.format(**values)
                        if new != v:
                            values[k] = new
                            changed = True
                if not changed:
                    break
            else:
                cyclic = {k: v for k, v in values.items()
                          if isinstance(v, str) and "{" in v}
                raise ValueError(
                    f"job #{j}: template expansion did not converge "
                    f"(cyclic references?): {cyclic}")
            label = job.get("name", command)
            if point:
                label += "[" + ",".join(f"{k}={v}" for k, v in point.items()) + "]"
            out.append({"command": command, "values": values,
                        "soft_keys": soft, "label": label})
    return out


def _job_config(command: str, values: dict, soft_keys=()):
    """Build the job's config. ``soft_keys`` (defaults-only keys) are
    dropped when the target config class lacks the field; every other
    unknown key raises."""
    cfg_cls, fn = _resolve_command(command)
    names = {f.name for f in fields(cfg_cls)}
    vals = {k: v for k, v in values.items()
            if k in names or k not in soft_keys}
    return cfg_cls, fn, config_from_values(cfg_cls, vals)


def _already_complete(job_cfg, mutate: bool = True) -> bool:
    """True when the job's results file already holds a complete run for
    THIS config (the driver-level resume identity, including the
    stale-file set-aside — suppressed with ``mutate=False`` for
    dry-run previews, which must be read-only).

    Two store layouts exist: the incremental per-iteration pickles of
    the decode/train drivers (complete when >= n_iter iterations), and
    the write-once sweep pickles of the subsample drivers
    ({'params','sweep','results'} — complete when params match exactly,
    INCLUDING n_iter, and results are non-empty). Jobs without an
    ``out``/``n_iter`` (e.g. realtime-sim) always re-run.
    """
    out = getattr(job_cfg, "out", "")
    n_iter = getattr(job_cfg, "n_iter", None)
    if not out or n_iter is None or not Path(out).exists():
        return False
    from cross_patient_speech_decoding_tpu.cli.experiments import (
        _completed_results,
        _same_run_config,
    )

    done = _completed_results(out, vars(job_cfg), scalar=False,
                              set_aside=mutate)
    if len(done) >= n_iter:
        return True
    if done:
        return False  # partially complete incremental run: resume it
    if not Path(out).exists():
        return False  # a config-mismatched file was just set aside
    from cross_patient_speech_decoding_tpu.data.loaders import load_pkl

    store = load_pkl(Path(out))
    if "results" in store and "sweep" in store:
        stored = store.get("params", {})
        return (_same_run_config(stored, vars(job_cfg))
                and stored.get("n_iter") == n_iter
                and bool(store["results"]))
    return False


def run_reproduce(cfg: ReproduceConfig, verbose: bool = True):
    """Expand the manifest and run (or resume) every job in sequence.

    Returns a summary dict: ``{"ran", "skipped", "filtered", "failed"}``.
    """
    import yaml

    if not cfg.manifest:
        raise ValueError("reproduce requires manifest=<path to YAML>")
    manifest = yaml.safe_load(Path(cfg.manifest).read_text())
    jobs = expand_manifest(manifest)

    filters = [s for s in cfg.only.split(",") if s]
    summary = {"ran": 0, "skipped": 0, "filtered": 0, "failed": []}
    plan = []
    for job in jobs:
        cfg_cls, fn, job_cfg = _job_config(
            job["command"], job["values"], job.get("soft_keys", ()))
        if cfg.n_devices and any(
                f.name == "n_devices" for f in fields(cfg_cls)):
            job_cfg = dataclasses_replace(job_cfg, n_devices=cfg.n_devices)
        if filters and not any(
                s in job["label"] or s in getattr(job_cfg, "out", "")
                for s in filters):
            summary["filtered"] += 1
            continue
        plan.append((job, fn, job_cfg))

    width = len(str(len(plan)))
    for i, (job, fn, job_cfg) in enumerate(plan):
        tag = f"[{i + 1:>{width}}/{len(plan)}] {job['label']}"
        # dry-run previews are READ-ONLY: no stale-file set-asides
        if _already_complete(job_cfg, mutate=not cfg.dry_run):
            summary["skipped"] += 1
            if verbose:
                print(f"{tag}: complete, skipping", flush=True)
            continue
        if cfg.dry_run:
            summary["ran"] += 1
            if verbose:
                out = getattr(job_cfg, "out", "")
                print(f"{tag}: would run" + (f" -> {out}" if out else ""),
                      flush=True)
            continue
        t0 = time.time()
        if verbose:
            print(f"{tag}: running...", flush=True)
        try:
            fn(job_cfg, verbose=verbose)
        except Exception as e:  # keep the matrix going when asked to
            summary["failed"].append(job["label"])
            if verbose:
                print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
            if not cfg.keep_going:
                raise
        else:
            summary["ran"] += 1
            if verbose:
                print(f"{tag}: done in {time.time() - t0:.1f}s", flush=True)
    if verbose:
        print(f"reproduce: {summary['ran']} ran, {summary['skipped']} "
              f"already complete, {summary['filtered']} filtered, "
              f"{len(summary['failed'])} failed", flush=True)
    return summary
