"""Launch training jobs on Cloud TPU VMs — the TPU-native analog of the
reference's SLURM submitter (reference submit_slurm.py:31-104; hvt keeps the
same CLI shape: --machine/--exp, --exp-dir sweeps, dry-run by default).

One job = one `gcloud compute tpus tpu-vm ssh --worker=all --command=...`
invocation that runs `python main.py` on every host of the slice; per-host
data sharding and the jax.distributed handshake happen inside hvt
(hvt/parallel.py, HVT_MULTIHOST). Pod slices therefore need no launcher
beyond this ssh fan-out — the TPU equivalent of slurm/train.bash's
`composer main.py`.

    python submit_tpu_vm.py --tpu my-v5e --zone us-west4-a \\
        --machine m.yaml --exp e1.yaml e2.yaml --submit
"""

import argparse
import os
import shlex
import subprocess

from hvt import config as config_lib


def build_command(
    tpu: str,
    zone: str,
    machine_file: str,
    exp_files: list[str],
    *,
    project: str = "",
    workdir: str = "~/hvt",
    env: dict[str, str] | None = None,
) -> list[str]:
    """The gcloud invocation for one training job (pure function — unit
    tested without gcloud installed)."""
    if not exp_files:
        raise ValueError("need at least one experiment file")
    inner = " ".join(
        ["cd", shlex.quote(workdir), "&&"]
        + [f"{k}={shlex.quote(v)}" for k, v in sorted((env or {}).items())]
        + ["python", "main.py", "--machine", shlex.quote(machine_file), "--exp"]
        + [shlex.quote(f) for f in exp_files]
    )
    cmd = [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", tpu,
        f"--zone={zone}",
        "--worker=all",
        f"--command={inner}",
    ]
    if project:
        cmd.insert(6, f"--project={project}")
    return cmd


def submit_job(cmd: list[str], dry_run: bool) -> None:
    if dry_run:
        print(" ".join(shlex.quote(c) for c in cmd))
        return
    try:
        out = subprocess.run(cmd, check=True, capture_output=True)
        print(out.stdout.decode(), end="")
    except subprocess.CalledProcessError as e:
        print(e.stderr.decode(), end="")
        print(e)


def main():
    parser = argparse.ArgumentParser()
    config_lib.add_exp_args(parser)
    parser.add_argument("--tpu", required=True, help="TPU VM / slice name")
    parser.add_argument("--zone", required=True)
    parser.add_argument("--project", default="")
    parser.add_argument("--workdir", default="~/hvt")
    parser.add_argument("--exp-dir", help="Submit one job per config in this directory.")
    parser.add_argument("--submit", action="store_true")
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args()

    dry_run = not args.submit
    env = {"HVT_MULTIHOST": "1"}

    def one(exp_files):
        submit_job(
            build_command(
                args.tpu, args.zone, args.machine, exp_files,
                project=args.project, workdir=args.workdir, env=env,
            ),
            dry_run,
        )

    if args.exp_dir:
        submitted = 0
        for entry in sorted(os.scandir(args.exp_dir), key=lambda e: e.name):
            if not entry.is_file():
                continue
            one(list(args.exp) + [entry.path])
            submitted += 1
            if args.limit and submitted >= args.limit:
                break
    else:
        one(list(args.exp))


if __name__ == "__main__":
    main()
