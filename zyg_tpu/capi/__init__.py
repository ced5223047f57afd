from .capi import *  # noqa: F401,F403
