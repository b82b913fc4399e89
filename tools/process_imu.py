#!/usr/bin/env python
"""IMU noise calibration from a recorded EuRoC-layout dataset.

Role of the reference's Examples/Calibration/python_scripts/process_imu.py:
read imu0/data.csv, compute the Allan deviation of gyro and accelerometer,
and extract the four parameters the SLAM config needs:

  IMU.NoiseGyro / IMU.NoiseAcc  — white-noise density (sigma at tau=1 s on
                                  the -1/2 slope of the Allan curve)
  IMU.GyroWalk  / IMU.AccWalk   — random-walk density (sigma at tau=3 s on
                                  the +1/2 slope)

Prints the ready-to-paste YAML block (the reference script plots the same
curves and leaves the reading to the user; here the slope fits are done
numerically).

    python tools/process_imu.py /path/to/dataset [--plot out.png]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def allan_deviation(x: np.ndarray, rate: float, n_taus: int = 60):
    """Overlapping Allan deviation of a sampled signal [N] at `rate` Hz.

    Returns (taus [T], adev [T])."""
    n = len(x)
    max_m = n // 9
    ms = np.unique(np.logspace(0, np.log10(max(max_m, 2)), n_taus)
                   .astype(int))
    ms = ms[ms >= 1]
    theta = np.cumsum(x) / rate          # integrated signal
    taus, adev = [], []
    for m in ms:
        tau = m / rate
        d = theta[2 * m:] - 2 * theta[m:-m] + theta[:-2 * m]
        if len(d) < 8:
            continue
        av = 0.5 / tau ** 2 * np.mean(d ** 2)
        taus.append(tau)
        adev.append(np.sqrt(av))
    return np.asarray(taus), np.asarray(adev)


def fit_noise_params(taus, adev):
    """White-noise density N (slope -1/2 @ tau=1) and random-walk K
    (slope +1/2 @ tau=3) from an Allan curve."""
    lo = (taus >= 0.02) & (taus <= 0.5)      # -1/2 slope region
    n_fit = float(np.exp(np.mean(np.log(adev[lo] * np.sqrt(taus[lo]))))) \
        if lo.sum() >= 3 else float("nan")
    # +1/2 slope region: use the largest taus, where the random walk
    # dominates the white-noise floor; sigma(tau) = K sqrt(tau/3)
    hi = taus >= max(taus[-1] / 4.0, 10.0)
    k_fit = float(np.exp(np.mean(
        np.log(adev[hi] / np.sqrt(taus[hi] / 3.0))))) \
        if hi.sum() >= 2 else float("nan")
    return n_fit, k_fit


def load_euroc_imu(path: str):
    csv = os.path.join(path, "imu0", "data.csv")
    rows = np.loadtxt(csv, delimiter=",", skiprows=1)
    ts = rows[:, 0] * 1e-9
    gyro = rows[:, 1:4]
    acc = rows[:, 4:7]
    rate = 1.0 / float(np.median(np.diff(ts)))
    return ts, gyro, acc, rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    ts, gyro, acc, rate = load_euroc_imu(args.dataset)
    print(f"{len(ts)} samples @ {rate:.1f} Hz "
          f"({ts[-1]-ts[0]:.1f} s)", file=sys.stderr)

    results = {}
    curves = {}
    for name, sig in (("Gyro", gyro), ("Acc", acc)):
        # detrend per-axis (gravity/bias mean), average the 3 axes' curves
        ads = []
        for ax in range(3):
            x = sig[:, ax] - np.mean(sig[:, ax])
            taus, ad = allan_deviation(x, rate)
            ads.append(ad)
        ad = np.mean(ads, axis=0)
        n_fit, k_fit = fit_noise_params(taus, ad)
        results[name] = (n_fit, k_fit)
        curves[name] = (taus, ad)

    print("# paste into the SLAM YAML (continuous-time densities):")
    print(f"IMU.NoiseGyro: {results['Gyro'][0]:.6e}   # rad/s/sqrt(Hz)")
    print(f"IMU.NoiseAcc: {results['Acc'][0]:.6e}    # m/s^2/sqrt(Hz)")
    print(f"IMU.GyroWalk: {results['Gyro'][1]:.6e}   # rad/s^2/sqrt(Hz)")
    print(f"IMU.AccWalk: {results['Acc'][1]:.6e}    # m/s^3/sqrt(Hz)")

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        for axp, name in zip(axes, ("Gyro", "Acc")):
            taus, ad = curves[name]
            axp.loglog(taus, ad, "b.-", lw=0.8)
            axp.set_title(f"{name} Allan deviation")
            axp.set_xlabel("tau [s]")
            axp.grid(True, which="both", alpha=0.3)
        fig.savefig(args.plot, dpi=100, bbox_inches="tight")
        print(f"plot -> {args.plot}", file=sys.stderr)


if __name__ == "__main__":
    main()
