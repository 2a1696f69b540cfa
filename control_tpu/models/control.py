"""Public problem-layer entry point mirroring the reference's ``Control``
namespace class (reference control/control.py:99)."""

from .stationary import Stationary
from .instationary import Instationary


class Control:
    Stationary = Stationary
    Instationary = Instationary
