from .misc import print_arguments
from .profiling import StepTimer, trace_annotation
