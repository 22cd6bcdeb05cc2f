"""Layer B operators: the reference's delegated SQL surface made native.

The reference runs arbitrary SQL inside the source/target databases
(ref: /root/reference/pypeline/Pype.py:36,167); these modules declare the
same operator classes as native Spark DataFrame plans so Catalyst can
optimize them (pushdown, pruning, join selection, AQE).
"""
