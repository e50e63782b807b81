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

# reference-name aliases (the reference's torch block helpers,
# /root/reference/paule/models.py:19-169; ours are init/apply function
# pairs in .blocks — these aliases cover code that imports the names)
from ..ops.derivatives import (  # noqa: F401,E402
    add_vel_and_acc_info, double_sequence)
from .blocks import (  # noqa: F401,E402
    time_conv_res_block as TimeConvResBlock,
    time_conv_res_block_init as TimeConvResBlock_init,
    time_conv_inception_block as TimeConvIncpetionBlock,
    time_conv_inception_block_init as TimeConvIncpetionBlock_init,
    mel_channel_conv as MelChannelConv1D,
    mel_channel_conv_init as MelChannelConv1D_init,
)
from .classifier import (  # noqa: F401,E402
    positional_encoding as PositionalEncoding,
    transformer_encoder_layer as CustomTransformerEncoderLayer,
    transformer_encoder_layer_init as CustomTransformerEncoderLayer_init,
)


def time_conv_Allx1(rng, channels, dtype=None):
    """Conv1d(ch, ch, 1) factory (reference models.py:19-23)."""
    import jax.numpy as jnp

    return blocks.conv1d_init(rng, channels, channels, 1,
                              dtype=dtype or jnp.float32)


def time_conv_1x3(rng, channels, dtype=None):
    """Channelwise Conv1d(ch, ch, 3, groups=ch) factory (models.py:26-34)."""
    import jax.numpy as jnp

    return blocks.conv1d_init(rng, channels, channels, 3, groups=channels,
                              dtype=dtype or jnp.float32)


def time_conv_1x5(rng, channels, dtype=None):
    """Channelwise Conv1d(ch, ch, 5, groups=ch) factory (models.py:37-45)."""
    import jax.numpy as jnp

    return blocks.conv1d_init(rng, channels, channels, 5, groups=channels,
                              dtype=dtype or jnp.float32)
