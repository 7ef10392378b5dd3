* Exercises OBJSENSE MAX, RANGES (on L, G and E rows), FX/FR/MI bounds,
* free rows beyond the objective, and Fortran D exponents.
NAME          MAXRANGE
OBJSENSE
    MAX
ROWS
 N  PROFIT
 N  JUNK
 L  CAP1
 G  MIN1
 E  BAL
COLUMNS
    A         PROFIT    3.0        CAP1      1.0
    A         MIN1      1.0        BAL       1.0
    A         JUNK      9.0
    B         PROFIT    2.0D0      CAP1      2.0
    B         BAL       -1.0
    C         PROFIT    1.0        CAP1      1.0
    C         MIN1      1.0
RHS
    R         CAP1      10.0       MIN1      1.0
    R         BAL       2.0
RANGES
    RNG       CAP1      4.0
    RNG       BAL       1.5
BOUNDS
 UP BD        A         6.0
 FX BD        C         1.0
ENDATA
