"""Core numeric ops: normalization tables, trajectory derivatives, losses,
padding/batching helpers and the fused LSTM scan."""

from . import derivatives, losses, lstm, normalize, padding  # noqa: F401
