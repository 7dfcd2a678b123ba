from . import logging, timing
