from .base import Move, NullMove
from .rotation import RandomLigandRotationMove
from .engine import MoveEngine
