"""Submit training jobs to SLURM (reference submit_slurm.py:31-104).

Configs travel via MACHINE_CONFIG_FILE / EXP_CONFIG_FILES env vars consumed
by slurm/train.bash. Dry-run by default; pass --submit to sbatch for real.

    python submit_slurm.py --machine m.yaml --exp base.yaml --exp-dir configs/sweeps/sweep-x --limit 10 --submit
"""

import argparse
import os
import subprocess

import yaml

from hvt import config as config_lib

LOG_DIR = os.path.join(os.getcwd(), "logs")
JOB_FILE = os.path.join(os.getcwd(), "slurm", "train.bash")


def submit_job(machine_file: str, exp_files: list[str], dry_run: bool) -> None:
    if not exp_files:
        raise ValueError("need at least one experiment file")

    with open(exp_files[-1]) as fd:
        job_name = yaml.safe_load(fd).pop("run_name")

    os.environ["MACHINE_CONFIG_FILE"] = machine_file
    os.environ["EXP_CONFIG_FILES"] = " ".join(exp_files)

    command = [
        "sbatch",
        f"--output={LOG_DIR}/%j-{job_name}.txt",
        f"--job-name={job_name}",
        JOB_FILE,
    ]
    if dry_run:
        print(" ".join(command))
        return

    os.makedirs(LOG_DIR, exist_ok=True)
    try:
        out = subprocess.run(command, check=True, capture_output=True)
        print(out.stdout.decode(), end="")
    except subprocess.CalledProcessError as e:
        print(e.stderr.decode(), end="")
        print(e)


def exp_files_in(exp_dir: str):
    for entry in sorted(os.scandir(exp_dir), key=lambda e: e.name):
        if entry.is_file():
            yield entry.path


def main():
    parser = argparse.ArgumentParser()
    config_lib.add_exp_args(parser)
    parser.add_argument("--exp-dir", help="Submit one job per config in this directory.")
    parser.add_argument("--submit", action="store_true", help="Actually submit.")
    parser.add_argument("--limit", type=int, default=0, help="Max jobs to submit.")
    args = parser.parse_args()

    dry_run = not args.submit
    if args.exp_dir:
        submitted = 0
        for exp_file in exp_files_in(args.exp_dir):
            submit_job(args.machine, list(args.exp) + [exp_file], dry_run)
            submitted += 1
            if args.limit and submitted >= args.limit:
                break
    else:
        submit_job(args.machine, list(args.exp), dry_run)


if __name__ == "__main__":
    main()
