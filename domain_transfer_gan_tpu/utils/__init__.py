from .artifacts import (
    save_results,
    print_log,
    format_log,
    copy_scripts_to_folder,
)
from .profiling import StepTimer
