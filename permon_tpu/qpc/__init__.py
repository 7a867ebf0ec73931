from .box import BoxConstraint
