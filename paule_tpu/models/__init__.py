"""Model zoo: JAX re-designs of the reference's PyTorch models
(/root/reference/paule/models.py), parameterized as plain pytrees with
torch-checkpoint-compatible layouts (see torch_convert)."""

from .forward import ForwardModel, ForwardModelMelTimeSmoothResidual  # noqa: F401
from .inverse import InverseModelMelTimeSmoothResidual  # noqa: F401
from .embedder import (  # noqa: F401
    EmbeddingModel,
    MelEmbeddingModelMelSmoothResidualUpsampling,
)
from .baselines import LinearModel, NonLinearModel  # noqa: F401
from .generative import (  # noqa: F401
    Critic,
    Generator,
    LSTMCritic,
    LSTMGenerator,
    SemVecToCpModel,
    SemVecToMelModel,
)
from .classifier import LinearClassifier, SpeechNonSpeechTransformer  # noqa: F401
from . import blocks, torch_convert  # noqa: F401
