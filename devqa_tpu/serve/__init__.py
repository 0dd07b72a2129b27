from .worker import ModelWorker  # noqa: F401
from .controller import Controller  # noqa: F401
from .web import WebServer  # noqa: F401
