"""8-state navigation EKF: [x y z c*dt vx vy vz c*dtdot] (meters, m/s).

Two modes, matching the reference's pair:

- "passthrough" (default): K = I, F = I — the measurement replaces the
  state. This is CUDARecv's shipped configuration (EnableEKF=false,
  cuekf.cu:147-159) and PyGNSS's "Debug for CUDARecv" l5 mode
  (ekf.py:23-45, 136-157).
- "full": random-walk F with T coupling, velocity-LPF process noise, H = I,
  R = I measurement covariance — CUDARecv StepPredict/StepUpdate
  (cuekf.cu:42-81, 626-721) / PyGNSS m5 variants (ekf.py:58-73, 159-177).
- "alpha": fixed-gain smoother x += alpha*(z - x) — the right steady-state
  filter for a static receiver with grid-argmax measurement noise; reduces
  fix scatter ~sqrt(alpha/(2-alpha)) while converging geometrically.

Host-side float64 numpy: an 8x8 solve per 20 ms is not device work.
"""

from __future__ import annotations

import numpy as np

from ..constants import C

Q_CLOCK_DRIFT = (2.5e-10 * C) ** 2


class NavEKF:
    def __init__(self, x0: np.ndarray, T: float = 0.02,
                 mode: str = "passthrough", alpha: float = 0.3):
        self.x = np.asarray(x0, dtype=np.float64).reshape(8).copy()
        self.T = float(T)
        self.mode = mode
        self.alpha = float(alpha)
        self.P = np.eye(8)
        self.F = np.eye(8)
        if mode == "full":
            for i in range(4):
                self.F[i, i + 4] = self.T
        self.H = np.eye(8)
        self.R = np.eye(8)
        self._v_lpf = np.zeros(20)
        self._v_n = 0

    def _update_q(self) -> np.ndarray:
        """Velocity-LPF process noise (cuekf.cu:42-81 / ekf.py:58-73)."""
        v = np.linalg.norm(self.x[4:7])
        self._v_lpf[self._v_n % 20] = v
        self._v_n += 1
        v = np.mean(self._v_lpf[:min(self._v_n, 20)])
        v = 1.0 + 250.0 / min(max(v * v, 50.0), 125.0)
        q = np.zeros((8, 8))
        q[4, 4] = q[5, 5] = q[6, 6] = v
        q[7, 7] = Q_CLOCK_DRIFT
        return self.F @ q @ self.F.T

    def time_update(self) -> np.ndarray:
        self.x = self.F @ self.x
        if self.mode == "full":
            self.P = self.F @ self.P @ self.F.T + self._update_q()
        return self.x

    def measurement_update(self, z: np.ndarray) -> np.ndarray:
        """z: the 8-state measurement (grid argmax / weighted mean)."""
        z = np.asarray(z, dtype=np.float64).reshape(8)
        if self.mode == "passthrough":
            self.x = z.copy()
            return self.x
        if self.mode == "alpha":
            self.x = self.x + self.alpha * (z - self.x)
            return self.x
        y = z - self.H @ self.x
        s = self.H @ self.P @ self.H.T + self.R
        k = self.P @ self.H.T @ np.linalg.inv(s)
        self.x = self.x + k @ y
        self.P = (np.eye(8) - k @ self.H) @ self.P
        return self.x
