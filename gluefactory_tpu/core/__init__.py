from .config import Config, from_dotlist, from_yaml, merge  # noqa: F401
