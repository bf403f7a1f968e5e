"""Relational + extension operators, all expressed as DataFrame
compositions so Catalyst plans them (broadcast vs shuffle, AQE, pushdown)
rather than us hand-scheduling anything."""
