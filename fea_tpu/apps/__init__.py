from .specs import APPLICATIONS, ApplicationSpec
from .runner import run_application

__all__ = ["APPLICATIONS", "ApplicationSpec", "run_application"]
