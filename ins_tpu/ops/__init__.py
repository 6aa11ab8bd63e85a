from .operators import *  # noqa: F401,F403
from .pressure import *  # noqa: F401,F403
from .initializers import *  # noqa: F401,F403
from .eddyviscosity import (  # noqa: F401
    apply_eddy_viscosity,
    divoftensor,
    divoftensor_natural,
    smagorinsky_closure,
    smagorinsky_closure_natural,
    smagorinsky_natural_interior,
    smagorinsky_viscosity,
    strain_natural,
)
from .tensorbasis import lastdimcontract, monitor, tensorbasis  # noqa: F401
from .fdm import psolver_fdm  # noqa: F401
