from . import objectives
