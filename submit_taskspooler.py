"""Queue training jobs with task-spooler on a single machine
(reference submit_taskspooler.py:26-93).

    python submit_taskspooler.py --machine m.yaml --exp e.yaml --submit
"""

import argparse
import os
import subprocess

from hvt import config as config_lib


def submit_job(machine_file: str, exp_files: list[str], dry_run: bool) -> None:
    if not exp_files:
        raise ValueError("need at least one experiment file")
    command = [
        "ts",
        "-G",
        "1",
        "python",
        "main.py",
        "--machine",
        machine_file,
        "--exp",
        *exp_files,
    ]
    if dry_run:
        print(" ".join(command))
        return
    try:
        out = subprocess.run(command, check=True, capture_output=True)
        print(out.stdout.decode(), end="")
    except subprocess.CalledProcessError as e:
        print(e.stderr.decode(), end="")
        print(e)


def main():
    parser = argparse.ArgumentParser()
    config_lib.add_exp_args(parser)
    parser.add_argument("--exp-dir", help="Submit one job per config in this directory.")
    parser.add_argument("--submit", action="store_true")
    parser.add_argument("--limit", type=int, default=0)
    args = parser.parse_args()

    dry_run = not args.submit
    if args.exp_dir:
        submitted = 0
        for entry in sorted(os.scandir(args.exp_dir), key=lambda e: e.name):
            if not entry.is_file():
                continue
            submit_job(args.machine, list(args.exp) + [entry.path], dry_run)
            submitted += 1
            if args.limit and submitted >= args.limit:
                break
    else:
        submit_job(args.machine, list(args.exp), dry_run)


if __name__ == "__main__":
    main()
