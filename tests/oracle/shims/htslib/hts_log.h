#ifndef ORACLE_HTSLIB_HTS_LOG_H
#define ORACLE_HTSLIB_HTS_LOG_H
enum htsLogLevel { HTS_LOG_OFF = 0 };
static inline void hts_set_log_level(enum htsLogLevel) {}
#endif
