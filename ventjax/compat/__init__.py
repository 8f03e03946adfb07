from ventjax.compat.vent_analysis import Vent_Analysis, extract_attributes

__all__ = ["Vent_Analysis", "extract_attributes"]
