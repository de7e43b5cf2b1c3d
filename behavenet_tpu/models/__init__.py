"""Model zoo: conv/linear AE family, VAE family, decoders.

All models are pure-functional JAX: a spec object built from hparams holds
static configuration; ``init(rng)`` returns a parameter pytree; ``apply``
is a pure function suitable for ``jax.jit`` / ``jax.grad``.
"""

from behavenet_tpu.models.aes import AE, ConditionalAE, AEMSP, load_pretrained_ae  # noqa
from behavenet_tpu.models.vaes import VAE, ConditionalVAE, BetaTCVAE, PSVAE, MSPSVAE  # noqa
from behavenet_tpu.models.decoders import Decoder, ConvDecoder  # noqa
