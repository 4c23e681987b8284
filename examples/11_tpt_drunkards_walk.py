"""TPT on the drunkard's-walk lattice (reference example
11_tpt_drunkards_walk.py; BASELINE.json config 1): committors + reactive
flux on a 2D lattice random walk, CPU-verifiable analytics."""

import numpy as np

from pmarlo_tpu.conformations.tpt_analysis import TPTAnalysis


def lattice_transition_matrix(width: int = 8, height: int = 8, p_stay: float = 0.2):
    """2D lattice walk with reflecting walls."""
    n = width * height
    T = np.zeros((n, n))
    for i in range(width):
        for j in range(height):
            s = i * height + j
            neighbors = []
            if i > 0:
                neighbors.append((i - 1) * height + j)
            if i < width - 1:
                neighbors.append((i + 1) * height + j)
            if j > 0:
                neighbors.append(i * height + j - 1)
            if j < height - 1:
                neighbors.append(i * height + j + 1)
            T[s, s] = p_stay
            for nb in neighbors:
                T[s, nb] = (1 - p_stay) / len(neighbors)
    return T


def main():
    width = height = 8
    T = lattice_transition_matrix(width, height)
    source = [0]                      # bottom-left corner
    sink = [width * height - 1]       # top-right corner
    result = TPTAnalysis(T).analyze(source, sink, n_pathways=5)
    q = result.forward_committor.reshape(width, height)
    print("committor field (rows = x):")
    for row in q:
        print(" ".join(f"{v:.2f}" for v in row))
    print(f"rate: {result.rate:.5f}  MFPT: {result.mfpt:.1f} steps")
    print("top pathways (as lattice sites):")
    for path, flux in result.pathways[:3]:
        print(f"  flux {flux:.5f}: {path}")


if __name__ == "__main__":
    main()
