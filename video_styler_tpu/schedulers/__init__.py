from .flow_match import FlowMatchScheduler
from .ddim import EnhancedDDIMScheduler
from .continuous_ode import ContinuousODEScheduler
from .flow_unipc import FlowUniPCMultistepScheduler
from .flow_dpm import FlowDPMSolverMultistepScheduler
