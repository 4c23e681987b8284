"""TPT basics on a hand-built 4-state chain (reference example
10_tpt_basic.py): committors, net flux, rate, MFPT, dominant pathway."""

import numpy as np

from pmarlo_tpu.conformations.tpt_analysis import TPTAnalysis

T = np.array([
    [0.90, 0.10, 0.00, 0.00],
    [0.20, 0.60, 0.20, 0.00],
    [0.00, 0.20, 0.60, 0.20],
    [0.00, 0.00, 0.10, 0.90],
])


def main():
    result = TPTAnalysis(T).analyze(source=[0], sink=[3])
    print("forward committor:", result.forward_committor.round(3))
    print("net flux:\n", result.net_flux.round(5))
    print(f"rate: {result.rate:.5f}  MFPT: {result.mfpt:.1f} steps")
    for path, flux in result.pathways:
        print(f"pathway {path} carries flux {flux:.5f}")


if __name__ == "__main__":
    main()
