#pragma once
#include "../stub/complex.h"
