from .timing import stage_timer, StageTimer

__all__ = ["stage_timer", "StageTimer"]
