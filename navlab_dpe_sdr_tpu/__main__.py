"""`python -m navlab_dpe_sdr_tpu` == the CLI (cli.main).

The reference's entry points are per-script (pygnss 0/1/2/3_*.py) or the
cudarecv console binary (main.cu:37-84); here one CLI fronts both stacks.
"""

from .cli import main

if __name__ == "__main__":
    main()
