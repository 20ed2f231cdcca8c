"""Time/frequency core: sample-rate conversion and time-windowed arrays.

TPU-native rebuild of the reference's time core (reference:
data_utils/data_utils/base.py:40-211).  Everything here is host-side
pure-NumPy by design: ragged time alignment happens *before* tensors enter
the XLA world, so the device only ever sees fixed-shape (B, L, D, T) blocks.

Semantics intentionally preserved from the reference (they define cache and
windowing behavior the rest of the stack relies on):

- ``Frequency.to_ind`` rounds (not floors) seconds -> sample index.
- ``TimedArray`` holds an array whose *last* axis is time at ``frequency``
  Hz starting at ``start`` seconds.  ``frequency == 0`` denotes a static
  (non-sampled) payload that covers ``[start, start + duration)``.
- ``a += b`` accumulates ``b``'s overlap onto ``a``'s grid; with
  ``aggregation="average"`` a streaming mean over per-timepoint counts is
  maintained (reference base.py:155-165).
- overlap windows are clamped so at least one timepoint is returned when
  windows touch (reference base.py:182-198).
"""

from __future__ import annotations

import typing as tp

import numpy as np

__all__ = ["Frequency", "TimedArray"]


class Frequency(float):
    """A sampling rate in Hz with second<->index conversions."""

    def to_ind(self, seconds: tp.Any) -> tp.Any:
        """Convert seconds to the nearest sample index at this rate."""
        if isinstance(seconds, np.ndarray):
            return np.round(seconds * self).astype(int)
        return int(round(seconds * self))

    def to_sec(self, index: tp.Any) -> tp.Any:
        """Convert a sample index to seconds at this rate."""
        return index / self


class TimedArray:
    """An nd-array whose last axis is a time grid, with overlap-add.

    Parameters
    ----------
    frequency: sampling rate of the last axis (Hz); 0 means static data
        spanning the full window.
    start: window start in seconds.
    data: payload; if None an empty accumulator of the right length is
        created from ``duration``.
    duration: window length in seconds (required when data is None or
        frequency == 0).
    aggregation: "sum" accumulates overlaps; "average" keeps a running
        mean via per-timepoint counts.
    """

    def __init__(
        self,
        *,
        frequency: float,
        start: float,
        data: np.ndarray | None = None,
        duration: float | None = None,
        aggregation: str = "sum",
    ) -> None:
        self.frequency = Frequency(frequency)
        self.start = start
        self.aggregation = aggregation
        if duration is not None and duration < 0:
            raise ValueError(f"duration should be None or >=0, got {duration}")

        if data is None:
            if duration is None:
                raise ValueError("Missing data or duration")
            if not frequency:
                data = np.zeros((0,))
            else:
                exp_size = max(1, self.frequency.to_ind(duration))
                data = np.zeros((0, exp_size))
        self.data = data

        if frequency and duration is not None:
            exp_size = max(1, self.frequency.to_ind(duration))
            if not self.data.shape[-1]:
                raise ValueError(
                    "Last dimension is empty but frequency is not null "
                    f"(shape={self.data.shape})"
                )
            if abs(data.shape[-1] - exp_size) > 2:
                raise ValueError(
                    f"Data has incorrect (last) dimension {data.shape} for "
                    f"duration {duration} and frequency {frequency} "
                    f"(expected {exp_size})"
                )
        if frequency:
            self.duration = float(self.frequency.to_sec(data.shape[-1]))
        elif duration is None:
            raise ValueError(f"duration must be provided if {frequency=}")
        else:
            self.duration = duration

        self._counts: np.ndarray | None = None
        if aggregation == "average":
            num = self.data.shape[-1] if self.frequency else 1
            self._counts = np.zeros(num, dtype=int)
        elif aggregation != "sum":
            raise ValueError(f"Unknown {aggregation=}")

    @property
    def stop(self) -> float:
        return self.start + self.duration

    def __repr__(self) -> str:
        fields = ["frequency", "start", "duration", "aggregation", "data"]
        inner = ",".join(f"{f}={getattr(self, f)}" for f in fields)
        return f"{type(self).__name__}({inner})"

    def _native_add(self, other: "TimedArray", self_slice, other_slice) -> bool:
        """Fused C++ overlap-add for the 2D float32 hot path (dataloader)."""
        if not (
            isinstance(self_slice, slice)
            and isinstance(other_slice, slice)
            and self.data.ndim == 2
            and other.data.ndim == 2
            and self.data.dtype == np.float32
            and other.data.dtype == np.float32
        ):
            return False
        from ..native import overlap_add

        n = (self_slice.stop or 0) - (self_slice.start or 0)
        return overlap_add(
            self.data, other.data, self_slice.start or 0, other_slice.start or 0, n
        )

    def _overlap_slice(
        self, start: float, duration: float
    ) -> tuple[float, float, slice | None] | None:
        """Overlap of [start, start+duration) with this array.

        Returns (aligned_start, aligned_duration, time_slice), or None if
        there is no overlap.  Touching windows (zero-width overlap) count
        only when one of the windows itself has zero duration.
        """
        if duration < 0:
            raise ValueError(f"duration should be >=0, got {duration=}")
        overlap_start = max(start, self.start)
        overlap_stop = min(start + duration, self.start + self.duration)
        if overlap_stop < overlap_start:
            return None
        if overlap_stop == overlap_start and self.duration and duration:
            return None
        if not self.frequency:
            return overlap_start, overlap_stop - overlap_start, None

        start_ind = self.frequency.to_ind(overlap_start - self.start)
        duration_ind = self.frequency.to_ind(overlap_stop - overlap_start)
        if duration_ind <= 0:
            duration_ind = 1  # always return at least one timepoint
        tps = self.data.shape[-1]
        if start_ind > tps - duration_ind:
            start_ind = tps - duration_ind
        if start_ind < 0:
            raise RuntimeError(f"Fail for {start=} {duration=} on {self}")
        a_start = float(self.frequency.to_sec(start_ind)) + self.start
        a_duration = float(self.frequency.to_sec(duration_ind))
        return a_start, a_duration, slice(start_ind, start_ind + duration_ind)

    def overlap(self, start: float, duration: float) -> tp.Optional["TimedArray"]:
        """Extract the sub-window overlapping [start, start+duration)."""
        out = self._overlap_slice(start, duration)
        if out is None:
            return None
        ostart, oduration, sl = out
        return TimedArray(
            frequency=self.frequency,
            start=ostart,
            duration=oduration,
            data=self.data[..., sl],
        )

    def __iadd__(self, other: "TimedArray") -> "TimedArray":
        if other.frequency and self.frequency != other.frequency:
            diff = abs(self.frequency - other.frequency)
            if diff * max(self.duration, other.duration) >= 0.5:
                raise ValueError(
                    "Cannot add with different (non-0) frequencies "
                    f"({other.frequency} and {self.frequency})"
                )
        if not self.data.size:
            # lazily adopt feature shape from the first contribution
            last = -1 if other.frequency else None
            shape = other.data.shape[:last]
            if self.frequency:
                shape += (self.data.shape[-1],)
            self.data = np.zeros(shape, dtype=other.data.dtype)
        if self.frequency:
            slices = [
                sa1._overlap_slice(sa2.start, sa2.duration)
                for sa1, sa2 in [(self, other), (other, self)]
            ]
            if slices[0] is None or slices[1] is None:
                return self
            self_slice = slices[0][-1]
            other_slice = slices[1][-1]
        else:
            self_slice = None
            other_slice = None
        if self._counts is None:
            if not self._native_add(other, self_slice, other_slice):
                self.data[..., self_slice] += other.data[..., other_slice]
        else:
            counts = self._counts[..., self_slice]
            upd = counts / (1.0 + counts)
            self.data[..., self_slice] *= upd
            self.data[..., self_slice] += (1 - upd) * other.data[..., other_slice]
            counts += 1
        return self
