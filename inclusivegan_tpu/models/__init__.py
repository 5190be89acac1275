from .stylegan2 import GMapping, GSynthesis, GMain, Discriminator, nf  # noqa: F401
