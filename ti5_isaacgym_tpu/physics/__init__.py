from . import contact, dynamics, engine, model, spatial  # noqa: F401
from .engine import PhysicsState, SolverOpts, substep  # noqa: F401
from .model import RobotModel, load_t1  # noqa: F401
