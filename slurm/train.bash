#!/bin/bash
#SBATCH --nodes=1
#SBATCH --time=08:00:00
#SBATCH --ntasks-per-node=1

# TPU analog of the reference's slurm/train.bash: one python process per host
# (jax.distributed discovers peers via the TPU runtime; the `composer`
# launcher's process-per-GPU model does not apply). Configs arrive via the
# MACHINE_CONFIG_FILE / EXP_CONFIG_FILES env vars set by submit_slurm.py.

source "${VENV_PATH:-$HOME/venv}/bin/activate" 2>/dev/null || true

python main.py \
    --machine "$MACHINE_CONFIG_FILE" \
    --exp $EXP_CONFIG_FILES
