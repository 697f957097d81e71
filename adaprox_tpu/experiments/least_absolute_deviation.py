"""Least-absolute-deviation experiment
(experiments/least_absolute_deviation/runme.jl): identical harness to the
square-root lasso but h = Translate(NormL1, -y), i.e. ||A x - y||_1
(runme.jl:40-42)."""

from .square_root_lasso import main as _main


def main(argv=None):
    return _main(argv, inner="l1", default_outdir="results/least_absolute_deviation")


if __name__ == "__main__":
    main()
