#!/usr/bin/env python
"""Iris dimensionality reduction (reference examples/Iris.ipynb workload):
7x7 SOM over the 150x4 Iris data; per-cell label majorities, quality
metrics, U-matrix."""

import numpy as np
from sklearn import datasets

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from xpysom_dask_tpu import XPySom


def main():
    iris = datasets.load_iris()
    data = iris.data.astype(np.float32)
    data = (data - data.mean(0)) / data.std(0)
    labels = np.asarray(iris.target_names)[iris.target]

    som = XPySom(7, 7, 4, sigma=3, learning_rate=0.5, random_seed=10)
    som.pca_weights_init(data)
    som.train(data, 50)

    print("quantization error:", round(som.quantization_error(data), 4))
    print("topographic error: ", round(som.topographic_error(data), 4))

    lm = som.labels_map(data, labels)
    grid = np.full((7, 7), "", dtype=object)
    for (i, j), counter in lm.items():
        grid[i, j] = counter.most_common(1)[0][0][:4]
    print("label majority per cell:")
    for row in grid:
        print("  " + " ".join(f"{c or '.':>4}" for c in row))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import os

        out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")
        os.makedirs(out, exist_ok=True)
        plt.figure(figsize=(5, 5))
        plt.pcolor(som.distance_map().T, cmap="bone_r")
        plt.colorbar()
        plt.title("Iris U-matrix")
        plt.savefig(os.path.join(out, "iris_umatrix.png"), dpi=100)
        print("wrote", os.path.join(out, "iris_umatrix.png"))
    except ImportError:
        pass


if __name__ == "__main__":
    main()
