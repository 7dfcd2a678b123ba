from .generator import Generator, GeneratorConfig
from .discriminator import Discriminator2D
