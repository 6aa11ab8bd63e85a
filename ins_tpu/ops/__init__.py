from .operators import *  # noqa: F401,F403
from .pressure import *  # noqa: F401,F403
from .initializers import *  # noqa: F401,F403
