from .seed import seed_everything
from .debug import debug_nans, debug_nans_scope, checked_loss
from .profiling import StepTimer, trace_scope
