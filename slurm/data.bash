#!/bin/bash
# One-time dataset split preparation as a SLURM job
# (reference slurm/data.bash: three rand_split runs over the raw iNat21 tree).
# Edit INPUT/OUTPUT_ROOT for your cluster paths.
#SBATCH --nodes=1
#SBATCH --time=8:00:00
#SBATCH --ntasks-per-node=32

INPUT=${INPUT:-/datasets/inat21/raw}
OUTPUT_ROOT=${OUTPUT_ROOT:-/datasets/inat21}

python -m hvt.tools.rand_split --kind species --frac 0.2 \
  --input "$INPUT" --output "$OUTPUT_ROOT/rand-species-split"

python -m hvt.tools.rand_split --kind genus --frac 0.2 \
  --input "$INPUT" --output "$OUTPUT_ROOT/rand-genus-split"

python -m hvt.tools.rand_split --kind subtree --frac 0.2 \
  --input "$INPUT" --output "$OUTPUT_ROOT/rand-subtree-split"
